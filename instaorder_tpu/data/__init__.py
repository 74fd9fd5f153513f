from . import rle

# register the native C++ codec fast paths when available (built on
# first use; silently fall back to the numpy implementations otherwise)
try:
    from .. import native as _native
    _native.load(build_if_missing=True)
except Exception:  # pragma: no cover - toolchain-less environments
    pass
