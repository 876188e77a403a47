from .shuffler import EpochShuffler, DistShuffler
