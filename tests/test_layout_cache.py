"""Layout disk-cache round trip."""
import numpy as np

from adaqp_tpu.common.types import GNNType
from adaqp_tpu.graph.layout import build_layout, load_layout, save_layout
from adaqp_tpu.graph.partition import partition_graph
from adaqp_tpu.helper import sbm_graph


def test_layout_save_load_roundtrip(tmp_path):
    g = sbm_graph(n=260, blocks=4, num_feats=10, seed=3)
    part = partition_graph(g, 4, method="ldg")
    lay = build_layout(g, part, GNNType.GCN)
    path = str(tmp_path / "lay")
    save_layout(path, lay)
    lay2 = load_layout(path)
    assert lay2 is not None
    assert lay2.k == lay.k and lay2.l_max == lay.l_max
    assert lay2.is_bidirected == lay.is_bidirected
    np.testing.assert_array_equal(lay2.local_ids, lay.local_ids)
    np.testing.assert_array_equal(lay2.plan_fwd.send_idx, lay.plan_fwd.send_idx)
    np.testing.assert_array_equal(lay2.plan_fwd.recv_slot, lay.plan_fwd.recv_slot)
    np.testing.assert_array_equal(lay2.fwd_local[0], lay.fwd_local[0])
    np.testing.assert_array_equal(lay2.fwd_halo[1], lay.fwd_halo[1])
    np.testing.assert_allclose(lay2.plan_fwd.scores_fp, lay.plan_fwd.scores_fp)
    # bidirected aliasing preserved (transpose == forward list)
    assert lay2.bwd_local[0] is lay2.fwd_local[0]
    np.testing.assert_array_equal(lay2.bwd_halo[0], lay.bwd_halo[0])
    assert load_layout(str(tmp_path / "missing")) is None
