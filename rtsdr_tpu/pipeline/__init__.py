"""Streaming pipeline (SURVEY.md layer L3).

The reference's four pthread stages (src/fm_radio.cpp:31,150,321,444) fuse
here into one jitted block-step program: ``receiver_step(state, iq) ->
(state, outputs)``.  Fan-out to audio and RDS consumers is just two branches
of one XLA computation; queues/mutexes dissolve (SURVEY.md §2c).
"""

from rtsdr_tpu.pipeline.receiver import (  # noqa: F401
    Receiver,
    ReceiverOutputs,
    ReceiverState,
)
