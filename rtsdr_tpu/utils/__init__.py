"""Auxiliary subsystems (SURVEY.md §5): observability, signal generators,
checkpointing, profiling."""

from rtsdr_tpu.utils.checkpoint import load_state, save_state  # noqa: F401
from rtsdr_tpu.utils.logging import log_vector  # noqa: F401
from rtsdr_tpu.utils.signals import (  # noqa: F401
    generate_sin,
    mix_sin,
    random_samples,
)
