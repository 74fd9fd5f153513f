from . import decode, metrics
