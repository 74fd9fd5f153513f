from .registry import get_backbone, BACKBONES
