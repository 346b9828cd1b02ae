"""Device-side DSP ops: XLA PCM primitives, the exact resampler, and the
fused Pallas voice-bank render kernels."""

from . import pcm  # noqa: F401
from . import resample  # noqa: F401
