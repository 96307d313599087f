#!/bin/bash
#SBATCH --job-name=bmhrl_bleu
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=8
#SBATCH --mem=16G
#SBATCH --time=48:00:00
srun python -m cli.run_training --mode BMHRL --scorer BLEU \
    --rl_warmstart_epochs 10 --one_by_one_starts_at 10 "$@"
