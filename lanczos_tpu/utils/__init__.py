from . import random, stats
