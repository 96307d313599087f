"""bmhrl_tpu: TPU-native audio-visual dense video captioning framework.

A from-scratch JAX/Flax/Pallas rebuild with the capabilities of the BMHRL
reference (bimodal hierarchical RL captioning). See ARCHITECTURE.md.
"""

__version__ = "1.0.0"  # keep in sync with pyproject.toml

from bmhrl_tpu.config import Config  # noqa: F401
