"""Every arch in the builtin table (common/__init__.py:97-132 analog)
instantiates and trains through the session API."""
import numpy as np
import pytest

import fgnn_tpu.session as sam


@pytest.mark.parametrize("arch", ["arch0", "arch1", "arch2", "arch3",
                                  "arch4", "arch5", "arch6", "arch7"])
def test_arch_smoke(arch):
    sam._reset_for_tests()
    cfg = dict(dataset="synthetic", model="graphsage", arch=arch,
               fanout=(3, 3), batch_size=32, num_epoch=1,
               sample_type="khop0", synthetic_nodes=1000, dropout=0.0)
    if arch in ("arch5", "arch6"):
        cfg.update(num_sample_worker=2, num_train_worker=2)
    if arch == "arch4":
        cfg.update(cache_policy="dynamic_cache", cache_percentage=0.1)
    sam.config(cfg)
    sam.data_init()
    sam.sample_init(0)
    sam.train_init(0)
    eng = sam._session.engine
    r = eng.run_epoch(0)
    assert np.isfinite(r["loss"]), (arch, r)
    sam.shutdown()
