from . import rle
