from . import nn, schedule
