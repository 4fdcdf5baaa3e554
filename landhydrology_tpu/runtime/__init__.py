"""Native runtime components (C++ with ctypes bindings).

The reference has no native code (SURVEY.md §2: pure Julia); the TPU
build's runtime side uses C++ where host-side throughput matters — today
the asynchronous trajectory sink (``native/trajsink.cpp``), which streams
saved states / checkpoints to disk on a background thread so host IO never
stalls the device loop.
"""

from landhydrology_tpu.runtime.io import TrajectorySink, native_available, read_trajectory

__all__ = ["TrajectorySink", "read_trajectory", "native_available"]
