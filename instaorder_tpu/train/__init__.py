from . import algos, optim, step
