"""Native (C++) host-runtime kernels, JIT-built with the system toolchain.

The TPU compute path is JAX/XLA/Pallas; the host runtime around it —
here the input pipeline's decode/resample — is C++, mirroring how the
reference JIT-compiles its one native component at import time
(bigvgan/alias_free_activation/cuda/load.py:17-65)."""

from dmel_codec_tpu.native.build import load_library, native_available

__all__ = ["load_library", "native_available"]
