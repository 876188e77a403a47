"""arch7 accessors: framework samples, app extracts (sgnn_dgl analog)."""
import jax.numpy as jnp
import numpy as np

import fgnn_tpu.session as sam


def test_arch7_load_subtensor_roundtrip():
    sam._reset_for_tests()
    sam.config(dict(dataset="synthetic", model="graphsage", arch="arch7",
                    fanout=(3, 3), batch_size=32, num_epoch=1,
                    sample_type="khop0", synthetic_nodes=1000))
    sam.data_init()
    sam.sample_init(0)
    sam.train_init(0)
    ds = sam._session.ds
    feat = jnp.asarray(np.asarray(ds.feat))
    sam.sample_once()
    key = sam.get_next_batch()
    in_nodes = sam.get_graph_input_nodes(key)
    out_nodes = sam.get_graph_output_nodes(key)
    feats = sam.load_subtensor(feat, in_nodes)
    assert feats.shape == (in_nodes.shape[0], ds.feat_dim)
    ids = np.asarray(in_nodes)
    # real rows match the table, padded rows are zero
    real = ids >= 0
    np.testing.assert_allclose(
        np.asarray(feats)[real], np.asarray(ds.feat)[ids[real]]
    )
    assert (np.asarray(feats)[~real] == 0).all()
    # host (numpy) path agrees with device path
    feats_np = sam.load_subtensor(np.asarray(ds.feat), in_nodes)
    np.testing.assert_allclose(np.asarray(feats_np), np.asarray(feats))
    assert np.asarray(out_nodes).shape[0] == 32
    sam.shutdown()
