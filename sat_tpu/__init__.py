"""SAT-TPU: a TPU-native Show, Attend and Tell framework (JAX/XLA/Pallas)."""

from .config import SATConfig, config_from_args
from .vocab import Vocab
