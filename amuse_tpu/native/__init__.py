"""Native (C++) IO: mmap'd binary cache + prefetching batch loader.

The TPU-framework analog of the reference's native storage layer (LMDB C
library + pyarrow serialisation, dm/dm.py:663-683). ``build()`` compiles the
shared library on first use with g++; ``NativeWindowLoader`` is the ctypes
front-end. Everything degrades gracefully to the pure-Python cache reader
when a toolchain is unavailable.
"""

from amuse_tpu.native.loader import (  # noqa: F401
    NativeWindowLoader,
    build,
    is_available,
    write_abin,
)
