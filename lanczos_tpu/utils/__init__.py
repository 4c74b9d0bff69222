from . import random, stats, estimate, checkpoint
