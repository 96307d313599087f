#!/bin/bash
#SBATCH --job-name=bmhrl_cider
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=8
#SBATCH --mem=16G
#SBATCH --time=48:00:00
# TPU-native equivalent of the reference's cider.sh/script_cider.sh pair:
# one job = one training run pinned to the CIDEr scorer.
srun python -m cli.run_training --mode BMHRL --scorer CIDER \
    --rl_warmstart_epochs 10 --one_by_one_starts_at 10 "$@"
