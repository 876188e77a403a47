from .policy import build_ranking
from .presample import presample_ranking
from .manager import FeatureCache
