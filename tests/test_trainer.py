"""End-to-end training-engine tests on a small slice of the bundled data."""

import os

import numpy as np
import pytest

from mgat_graphsage_tpu.data import MolecularDataset, load_csv, TRAIN_CSV, VAL_CSV
from mgat_graphsage_tpu.eval import regression_metrics
from mgat_graphsage_tpu.train import Trainer, get_config


@pytest.fixture(scope="module")
def small_data():
    sm, y = load_csv(TRAIN_CSV)
    vs, vy = load_csv(VAL_CSV)
    train = MolecularDataset(sm[:200], y[:200], fit_scaler=True,
                             fingerprint=None, verbose=False)
    val = MolecularDataset(vs[:64], vy[:64], scaler=train.scaler,
                           fingerprint=None,
                           max_nodes=train.max_nodes,
                           max_edges=train.max_edges, verbose=False)
    return train, val


@pytest.fixture(scope="module")
def small_fp_data():
    sm, y = load_csv(TRAIN_CSV)
    vs, vy = load_csv(VAL_CSV)
    train = MolecularDataset(sm[:128], y[:128], fit_scaler=True,
                             fingerprint="ecfp1024", verbose=False)
    val = MolecularDataset(vs[:64], vy[:64], scaler=train.scaler,
                           fingerprint="ecfp1024",
                           max_nodes=train.max_nodes,
                           max_edges=train.max_edges, verbose=False)
    return train, val


def test_gcn_end_to_end_loss_decreases(small_data):
    train, val = small_data
    cfg = get_config("gcn", epochs=8, batch_size=32, featurizer="35",
                     lr=3e-3)
    trainer = Trainer(cfg, train, val)
    state, best_state, history = trainer.fit(verbose=False)
    losses = [h["train_loss"] for h in history]
    assert len(losses) == 8
    assert losses[-1] < losses[0] * 0.9, losses
    assert all(np.isfinite(l) for l in losses)
    assert "val_mse" in history[-1]


def test_hybrid_end_to_end_and_checkpoint(tmp_path, small_fp_data):
    train, val = small_fp_data
    cfg = get_config("flagship", epochs=3, batch_size=32)
    trainer = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    state, best_state, history = trainer.fit(verbose=False)
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    # best checkpoint written with scaler metadata
    ckpt = os.path.join(str(tmp_path), "best_model.msgpack")
    assert os.path.exists(ckpt)
    restored, meta = trainer.load(ckpt)
    assert meta["scaler"]["scale"] > 0
    assert meta["config"]["name"] == "flagship"
    # restored params give identical predictions
    ev1 = trainer.evaluate(best_state)
    ev2 = trainer.evaluate(restored)
    np.testing.assert_allclose(ev1["pred"], ev2["pred"], atol=1e-6)
    # original-scale predictions are de-normalized
    m = regression_metrics(val.y_orig, ev2["pred_denorm"])
    assert np.isfinite(m["rmse"])


def test_eval_handles_partial_final_batch(small_data):
    train, val = small_data
    cfg = get_config("graphsage", epochs=1, batch_size=32,
                     eval_batch_size=50)  # 64 val rows -> 50 + 14
    trainer = Trainer(cfg, train, val)
    state = trainer.init_state()
    ev = trainer.evaluate(state)
    assert ev["pred"].shape[0] == len(val)


def test_flat_attention_mode_trains(small_data):
    """The reference-quirk batch-global attention mode must train end to
    end (regression: the Pallas kernel must NOT engage for the flat
    node set, whose [B*N, B*N] scores exceed VMEM)."""
    train, val = small_data
    cfg = get_config("model3", epochs=2, batch_size=32).replace(
        flat_attention=True)
    _, _, h = Trainer(cfg, train, val).fit(verbose=False)
    assert np.isfinite(h[-1]["train_loss"])
    assert h[-1]["train_loss"] < h[0]["train_loss"]


def test_training_deterministic(small_data):
    """Same seed -> bit-identical training trajectory (the reference pins
    seed 42 everywhere, train.py:13-16; our replacement for its
    cudnn-deterministic setting)."""
    train, val = small_data
    cfg = get_config("graphsage", epochs=3, batch_size=32)
    h1 = Trainer(cfg, train, val).fit(verbose=False)[2]
    h2 = Trainer(cfg, train, val).fit(verbose=False)[2]
    for a, b in zip(h1, h2):
        assert a["train_loss"] == b["train_loss"]
        assert a["val_mse"] == b["val_mse"]
    # different seed -> different trajectory
    h3 = Trainer(cfg.replace(seed=7), train, val).fit(verbose=False)[2]
    assert h3[-1]["train_loss"] != h1[-1]["train_loss"]


def test_predictor_api(tmp_path, small_data):
    """Serving-style Predictor: load checkpoint once, predict raw SMILES."""
    from mgat_graphsage_tpu.eval.predict import Predictor

    train, val = small_data
    cfg = get_config("graphsage", epochs=2, batch_size=32)
    trainer = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    trainer.fit(verbose=False)
    p = Predictor(str(tmp_path / "best_model.msgpack"))
    preds = p(["CCO", "c1ccccc1O", "CC(=O)Oc1ccccc1C(=O)O"])
    assert preds.shape == (3,)
    assert np.all(np.isfinite(preds))
    # single-string convenience
    one = p("CCO")
    assert one.shape == (1,)
    np.testing.assert_allclose(one[0], preds[0], atol=1e-5)


def test_predictor_reuses_compiled_program(tmp_path, small_data):
    """Serving perf regression: repeat Predictor calls at the same input
    size must hit the jitted scan's cache (a fresh closure per call
    would re-trace — over the TPU tunnel, re-COMPILE — every request)."""
    from mgat_graphsage_tpu.eval.predict import Predictor

    train, val = small_data
    cfg = get_config("graphsage", epochs=1, batch_size=32)
    trainer = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    trainer.fit(verbose=False)
    p = Predictor(str(tmp_path / "best_model.msgpack"))
    p(["CCO", "c1ccccc1O"])
    n_traced = p._scan_fn._cache_size()
    # different request sizes in the same bucket share the compiled
    # program (the serving path pads device arrays to a power-of-two
    # batch count, so the traced shapes are bucket-keyed, not size-keyed)
    p(["CCC", "c1ccncc1", "CCN"])
    p("CCCC")
    assert p._scan_fn._cache_size() == n_traced


def test_predictor_bf16_inference_close_to_f32(tmp_path, small_data):
    """infer_dtype='bfloat16' serves within bf16 rounding of the f32
    path (f32 accumulation + f32 de-normalization preserved)."""
    from mgat_graphsage_tpu.eval.predict import Predictor

    train, val = small_data
    cfg = get_config("graphsage", epochs=2, batch_size=32)
    trainer = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    trainer.fit(verbose=False)
    smiles = ["CCO", "c1ccccc1O", "CC(=O)Oc1ccccc1C(=O)O", "CCN(CC)CC"]
    f32 = Predictor(str(tmp_path / "best_model.msgpack"))(smiles)
    b16 = Predictor(str(tmp_path / "best_model.msgpack"),
                    infer_dtype="bfloat16")(smiles)
    assert np.all(np.isfinite(b16))
    np.testing.assert_allclose(b16, f32, rtol=0.05, atol=0.05)


def test_predictor_nan_aligns_invalid_smiles(tmp_path, small_data):
    """ADVICE r1: dropped (unparseable) molecules must yield NaN rows,
    not silently shift every later prediction up one index."""
    from mgat_graphsage_tpu.eval.predict import Predictor

    train, val = small_data
    cfg = get_config("graphsage", epochs=1, batch_size=32)
    trainer = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    trainer.fit(verbose=False)
    p = Predictor(str(tmp_path / "best_model.msgpack"))
    good = p(["CCO", "c1ccccc1O"])
    mixed = p(["CCO", "not_a_smiles((", "c1ccccc1O"])
    assert mixed.shape == (3,)
    assert np.isnan(mixed[1])
    np.testing.assert_allclose(mixed[[0, 2]], good, atol=1e-5)
    # all-invalid input -> all-NaN, same length
    assert np.isnan(p(["(((", ")))"])).all()


def test_fit_without_val_ds_returns_usable_state(small_data):
    """ADVICE r1: with val_ds=None the returned best_state used to alias
    the donated (deleted) initial state; it must be the final state."""
    train, _ = small_data
    cfg = get_config("graphsage", epochs=2, batch_size=32)
    trainer = Trainer(cfg, train, val_ds=None)
    state, best_state, history = trainer.fit(verbose=False)
    # touching the buffers raises if they were donated away
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(best_state.params)]
    assert all(np.isfinite(l).all() for l in leaves)
    assert len(history) == 2


def test_padded_rows_do_not_contaminate_batchnorm_stats(small_data):
    """ADVICE r1: GIN's MaskedBatchNorm statistics must exclude the
    duplicate index-0 rows padding the final partial batch.  One train
    step on 8 real molecules must produce the SAME batch statistics as
    one step on those 8 plus 8 masked duplicate rows."""
    import jax
    import jax.numpy as jnp

    train, _ = small_data
    cfg = get_config("gin", epochs=1, batch_size=8)

    def make_batch(n_pad):
        sel = np.concatenate([np.arange(8), np.zeros(n_pad, np.int64)])
        return {
            "nodes": jnp.asarray(train.nodes[sel]),
            "edges": jnp.asarray(train.edges[sel]),
            "node_mask": jnp.asarray(train.node_mask[sel]),
            "edge_mask": jnp.asarray(train.edge_mask[sel]),
            "fp": jnp.asarray(train.fp[sel]),
            "y": jnp.asarray(train.y[sel]),
            "y_orig": jnp.asarray(train.y_orig[sel]),
            "sample_mask": jnp.asarray(
                np.concatenate([np.ones(8, np.float32),
                                np.zeros(n_pad, np.float32)])),
        }

    def stats_after_one_step(batch):
        t = Trainer(cfg, train, None)
        state = t.init_state()
        t._build_steps()
        new_state, _ = t._train_step(state, batch, jax.random.PRNGKey(0))
        return jax.device_get(new_state.batch_stats)

    clean = stats_after_one_step(make_batch(0))
    padded = stats_after_one_step(make_batch(8))
    for a, b in zip(jax.tree_util.tree_leaves(clean),
                    jax.tree_util.tree_leaves(padded)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_predict_flat_mode_invariant_to_final_batch_padding(small_fp_data):
    """predict_dataset pads the final partial batch with duplicate rows;
    in flat-attention mode those rows must be masked out of the
    cross-molecule attention or predictions depend on the batch split."""
    import jax
    import jax.numpy as jnp

    from mgat_graphsage_tpu.eval.predict import predict_dataset
    from mgat_graphsage_tpu.ops import dense_adjacency
    from mgat_graphsage_tpu.train.trainer import TrainState, build_model

    train, val = small_fp_data
    cfg = get_config("flagship_flat")
    assert cfg.flat_attention
    model = build_model(cfg)
    n = val.max_nodes
    variables = jax.jit(model.init)(
        __import__("jax").random.PRNGKey(0),
        jnp.asarray(val.nodes[:4]),
        dense_adjacency(jnp.asarray(val.edges[:4]),
                        jnp.asarray(val.edge_mask[:4]), n),
        jnp.asarray(val.node_mask[:4]), jnp.asarray(val.fp[:4]))
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"], batch_stats={},
                       opt_state=None)
    # 30 molecules: bs=10 (exact) vs bs=8 (30 = 3*8 + 6 + 2 dups)
    sub = type(val).__new__(type(val))
    sub.__dict__ = dict(val.__dict__)
    for f in ("nodes", "edges", "node_mask", "edge_mask", "fp", "y",
              "y_orig"):
        setattr(sub, f, getattr(val, f)[:30])
    sub.smiles = val.smiles[:30]
    sub.n = 30
    p_exact = predict_dataset(model, state, cfg, val.scaler, sub,
                              batch_size=10)
    p_padded = predict_dataset(model, state, cfg, val.scaler, sub,
                               batch_size=8)
    # same molecules grouped differently STILL differ in flat mode (real
    # neighbors change), but the dup-padded rows must not contribute:
    # compare the padded run against an explicit 8-at-a-time run where
    # the last batch holds only the 6 real molecules
    p_manual = []
    for s in range(0, 30, 8):
        chunk = type(val).__new__(type(val))
        chunk.__dict__ = dict(sub.__dict__)
        for f in ("nodes", "edges", "node_mask", "edge_mask", "fp", "y",
                  "y_orig"):
            setattr(chunk, f, getattr(sub, f)[s:s + 8])
        chunk.smiles = sub.smiles[s:s + 8]
        chunk.n = len(chunk.smiles)
        p_manual.append(predict_dataset(model, state, cfg, val.scaler,
                                        chunk, batch_size=8))
    np.testing.assert_allclose(p_padded, np.concatenate(p_manual),
                               atol=1e-5)
    assert p_exact.shape == p_padded.shape == (30,)


def test_fused_adam_matches_optax_chain():
    """train/optim.py::torch_adam must reproduce the optax
    chain(add_decayed_weights, scale_by_adam, scale) trajectory exactly
    in float32 (it replaces that chain on the hot path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mgat_graphsage_tpu.train.optim import torch_adam

    lr, wd = 1e-3, 1e-4
    params = {"a": jnp.linspace(-1, 1, 64).reshape(8, 8),
              "b": jnp.ones(5) * 0.3}
    ref_tx = optax.chain(optax.add_decayed_weights(wd),
                         optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                         optax.scale(-lr))
    new_tx = torch_adam(lr, weight_decay=wd)

    def run(tx):
        p = jax.tree_util.tree_map(jnp.array, params)
        s = tx.init(p)
        key = jax.random.PRNGKey(0)
        for i in range(25):
            key, sub = jax.random.split(key)
            g = jax.tree_util.tree_map(
                lambda x: jax.random.normal(sub, x.shape) * 0.1, p)
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p

    p1, p2 = run(ref_tx), run(new_tx)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_factored_v_exact_on_rank1_grads():
    """adam_factored_v stores v for huge 2-D leaves as row/col EMA
    vectors.  When every step's gradient shares one outer-product
    direction (g_t = s_t * outer(a, b)), the EMA of g^2 stays exactly
    rank-1, so the reconstruction outer(r, c)/mean(r) is EXACT and the
    factored trajectory must match full Adam to float tolerance — this
    pins the reconstruction + bias-correction algebra, not just "loss
    goes down".  (With per-step random directions the EMA is a SUM of
    rank-1 terms and the estimate is approximate by design.)"""
    import jax
    import jax.numpy as jnp
    import optax

    from mgat_graphsage_tpu.train.optim import torch_adam

    lr = 1e-3
    params = {"w": jnp.linspace(-1, 1, 96).reshape(12, 8),
              "b": jnp.ones(5) * 0.3}

    # state layout: the 12x8 leaf factors into (r[12], c[8]); the
    # 1-D bias keeps a full v
    fact = torch_adam(lr, factored_v_min_size=96)
    nu_leaves = jax.tree_util.tree_leaves(
        fact.init(params).nu, is_leaf=lambda t: isinstance(t, tuple))
    (full,) = [t for t in nu_leaves if not isinstance(t, tuple)]
    ((r, c),) = [t for t in nu_leaves if isinstance(t, tuple)]
    assert full.shape == (5,) and r.shape == (12,) and c.shape == (8,)

    a = jnp.linspace(0.2, 1.4, 12)
    bb = jnp.linspace(-1.0, 1.0, 8) + 0.1

    def run(tx):
        p = jax.tree_util.tree_map(jnp.array, params)
        s = tx.init(p)
        key = jax.random.PRNGKey(0)
        for _ in range(20):
            key, k1 = jax.random.split(key)
            scale = jax.random.normal(k1, ())  # varying scale AND sign
            g = {"w": scale * jnp.outer(a, bb), "b": jnp.ones(5) * 0.05}
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p

    # weight decay adds wd*p to g, which is NOT rank-1 — run with wd=0
    # so g^2 stays exactly rank-1 and the comparison is analytic
    p1, p2 = run(torch_adam(lr)), run(fact)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_factored_v_trains_and_checkpoints(tmp_path, small_data):
    """End-to-end: adam_factored_v=True trains (loss decreases), the
    factored (r, c) state survives a full save/load round trip, and
    resumed training continues bit-compatibly with the restored
    state."""
    import jax
    import jax.numpy as jnp

    train, val = small_data
    cfg = get_config("graphsage", epochs=4, batch_size=32,
                     adam_factored_v=True)
    tr = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    state, best, hist = tr.fit(verbose=False)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    # the small model has no >=2^20-element kernel, so nothing factors:
    # state must be plain arrays (the flag is a no-op below threshold)
    tuples = [t for t in jax.tree_util.tree_leaves(
        state.opt_state.nu, is_leaf=lambda t: isinstance(t, tuple))
        if isinstance(t, tuple)]
    assert tuples == []

    # force factoring via the optimizer directly to pin serialization
    from flax import serialization

    from mgat_graphsage_tpu.train.optim import torch_adam
    tx = torch_adam(1e-3, factored_v_min_size=16)
    p = {"w": jnp.ones((8, 4)), "b": jnp.zeros(3)}
    s = tx.init(p)
    u, s = tx.update(jax.tree_util.tree_map(jnp.ones_like, p), s, p)
    blob = serialization.to_bytes(s)
    s2 = serialization.from_bytes(tx.init(p), blob)
    for a, b in zip(jax.tree_util.tree_leaves(s),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_factored_v_rejects_sr_master():
    """The fused SR update path keeps a full v; combining it with
    adam_factored_v must fail loudly at construction."""
    cfg = get_config("flagship", adam_factored_v=True,
                     compute_dtype="bfloat16", master_dtype="bfloat16",
                     adam_moment_dtype="bfloat16")
    with pytest.raises(ValueError, match="factored"):
        Trainer(cfg, None, None)


def test_bf16_moment_adam_tracks_f32(small_data):
    """adam_moment_dtype='bfloat16' (the fast TPU option) must track the
    f32 trajectory closely over a short run — storage-only quantization
    of smooth EMAs, not a different optimizer."""
    train, val = small_data
    cfg = get_config("graphsage", epochs=4, batch_size=32)
    h32 = Trainer(cfg, train, val).fit(verbose=False)[2]
    hbf = Trainer(cfg.replace(adam_moment_dtype="bfloat16"),
                  train, val).fit(verbose=False)[2]
    for a, b in zip(h32, hbf):
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=2e-2)
        assert b["val_mse"] == pytest.approx(a["val_mse"], rel=5e-2)


def test_resume_training(tmp_path, small_data):
    train, val = small_data
    cfg = get_config("graphsage", epochs=2, batch_size=32)
    t1 = Trainer(cfg, train, val)
    s1, _, h1 = t1.fit(verbose=False)
    path = str(tmp_path / "resume.msgpack")
    t1.save(path, s1)
    t2 = Trainer(cfg, train, val)
    s2, meta = t2.load(path)
    assert int(np.asarray(s2.step)) == int(np.asarray(s1.step))
    s3, _, h3 = t2.fit(epochs=3, state=s2, start_epoch=2, verbose=False)
    assert int(np.asarray(s3.step)) > int(np.asarray(s2.step))


def test_remat_trajectory_matches(small_fp_data):
    """cfg.remat recomputes the forward in the backward (jax.checkpoint)
    — a pure memory/FLOPs dial: same loss math, same grads up to
    recompute fusion reordering (observed ~1e-7 relative on the
    post-update val MSE; exact equality does NOT hold because XLA
    fuses the recomputed forward differently)."""
    train, val = small_fp_data
    cfg = get_config("flagship", epochs=1, batch_size=32)
    h0 = Trainer(cfg, train, val).fit(verbose=False)[2]
    h1 = Trainer(cfg.replace(remat=True), train, val).fit(verbose=False)[2]
    for a, b in zip(h0, h1):
        assert a["train_loss"] == pytest.approx(b["train_loss"],
                                                rel=1e-5), (a, b)
        assert a["val_mse"] == pytest.approx(b["val_mse"], rel=1e-5), (a, b)


def test_lr_schedule_warmup_cosine_shape():
    """_lr_schedule: linear ramp to cfg.lr over warmup_steps, cosine
    down to lr*lr_final_ratio at total_steps, flat floor after."""
    import numpy as np

    from mgat_graphsage_tpu.train.trainer import _lr_schedule

    cfg = get_config("flagship", lr=1e-3, lr_schedule="warmup_cosine",
                     warmup_steps=10, lr_final_ratio=0.1)
    sched = _lr_schedule(cfg, total_steps=100)
    assert callable(sched)
    np.testing.assert_allclose(float(sched(1.0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5.0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10.0)), 1e-3, rtol=1e-6)
    # midpoint of the cosine span (warm=10 -> span=90 -> mid at 55):
    mid = float(sched(55.0))
    np.testing.assert_allclose(mid, 0.5 * (1e-3 + 1e-4), rtol=1e-3)
    np.testing.assert_allclose(float(sched(100.0)), 1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(sched(500.0)), 1e-4, rtol=1e-3)
    # constant stays a plain float (the reference's behavior)
    c = _lr_schedule(get_config("flagship"), total_steps=100)
    assert c == get_config("flagship").lr


def test_lr_schedule_trains_and_checkpoints(tmp_path, small_fp_data):
    """A warmup_cosine run must train (loss decreases), carry its
    schedule through the fused optimizer, and restore exactly."""
    train, val = small_fp_data
    cfg = get_config("flagship", epochs=5, batch_size=32,
                     lr_schedule="warmup_cosine", warmup_steps=3,
                     lr_final_ratio=0.1)
    tr = Trainer(cfg, train, val, ckpt_dir=str(tmp_path))
    state, best, hist = tr.fit(verbose=False)
    losses = [h["train_loss"] for h in hist]
    # 20 scheduled steps: the best later epoch must beat epoch 1 (the
    # exact trajectory is noisy this early — KL term + warmup)
    assert min(losses[2:]) < losses[0], losses
    live = tr.evaluate(best, val)
    restored_state, _ = tr.load(os.path.join(str(tmp_path),
                                             "best_model.msgpack"))
    again = tr.evaluate(restored_state, val)
    np.testing.assert_array_equal(live["pred_denorm"],
                                  again["pred_denorm"])
