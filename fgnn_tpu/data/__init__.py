from .schema import Dataset
from .loader import load_dataset, parse_meta
from .synthetic import make_synthetic_dataset, write_dataset
