from .padding import SamplePlan, make_plan
from .hashtable import unique_with_seeds, lookup_local_ids, unique_and_remap
from .sampling import sample_layer, multi_layer_sample
