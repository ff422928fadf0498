"""Host I/O: streaming runner, audio emit, wav artifacts (SURVEY.md L1)."""

from rtsdr_tpu.io.stream import StreamRunner  # noqa: F401
from rtsdr_tpu.io.wav import write_wav  # noqa: F401
