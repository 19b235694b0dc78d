"""Every config preset builds, initializes, and completes a train+eval
step — catches model/config wiring drift across the whole zoo."""

import numpy as np
import pytest

from mgat_graphsage_tpu.data import MolecularDataset
from mgat_graphsage_tpu.train import PRESETS, Trainer, get_config

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "c1ccncc1", "CCCC",
          "CC(C)O", "c1ccc(Cl)cc1", "CC(=O)Oc1ccccc1C(=O)O",
          "c1cc[nH]c1", "CS(=O)(=O)C", "CCOC(=O)C",
          "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "C1CCNCC1", "OCCO", "NCCN"]
TARGETS = np.linspace(4.0, 9.0, len(SMILES)).astype(np.float32)

# graph-only presets + representatives of each hybrid fp-dim path
# (1024 default, 167 small, 2048 wide use the same CNN code)
SMOKE_PRESETS = ["flagship", "model1", "model2", "model3", "model4",
                 "model5", "gcn", "graphsage", "gat", "gat_gcn", "gin",
                 "chebnet", "maccs", "morgan2048"]


@pytest.mark.parametrize("name", SMOKE_PRESETS)
def test_preset_one_step(name):
    cfg = get_config(name, epochs=1, batch_size=8, eval_batch_size=8)
    train = MolecularDataset(SMILES, TARGETS,
                             fit_scaler=cfg.scale_targets,
                             fingerprint=cfg.fingerprint,
                             featurizer=cfg.featurizer, verbose=False)
    trainer = Trainer(cfg, train, train)
    _, best, history = trainer.fit(verbose=False)
    assert len(history) == 1
    row = history[0]
    assert np.isfinite(row["train_loss"])
    assert np.isfinite(row["val_mse"])
    assert np.isfinite(row["original_mse"])


def test_every_preset_constructs():
    from mgat_graphsage_tpu.train.trainer import build_model

    for name in PRESETS:
        cfg = get_config(name)
        model = build_model(cfg)
        assert model is not None, name


# Complete per-preset hyperparameter table pinned against the reference
# scripts (VERDICT r2 #2: model1's wrong batch size slipped through because
# only 3 presets were pinned).  Columns:
#   (lr, weight_decay, kl_lambda, batch, eval_batch, epochs, dropout,
#    scale_targets, select_metric)
# Reference citations per row:
#   flagship/model6/flagship_flat/flagship_bf16: train.py:209-229 (bs
#     128/64, Adam lr 1e-3 wd 1e-4, lambda_kl 1e-3, 1000 epochs, Dropout
#     0.3, StandardScaler + original-scale selection train.py:173,284)
#   model1: ablation/model1.py:109-120 (bs 64/32, lr 1e-4, no wd, 1000
#     epochs, dropout 0.2, no scaler, val-MSE selection)
#   model2/model3: ablation/model 2.py:142-153 / model 3.py:142-153
#     (bs 128/64, lr 5e-3, dropout 0.2)
#   model4: ablation/model 4.py:193-211 (bs 128/64, lr 5e-3, dropout 0.3,
#     plain MSE); model5: ablation/model 5.py:204-220 (+ lambda_kl 0.001)
#   gcn: gnn/gcn.py:98-109 (bs 32/32, lr 5.9e-4, 10 epochs, dropout 0.1)
#   graphsage: gnn/graphsage.py:107-117; gat: gnn/gat.py:103-113
#     (bs 128/64, lr 5e-3, dropout 0.2)
#   gat_gcn: gnn/gat-gcn.py:108-119 (bs 64/32, lr 1e-4, dropout 0.2)
#   gin: gnn/gin.py:138-149; chebnet: gnn/chebnet.py:128-138
#     (bs 128/64, lr 5e-3, dropout 0.2)
#   fingerprint suite: fingerprint/*:199-219 (SMIFP.py:231-251,
#     BCI.py:294-314) — all use the flagship recipe
_FLAG = (1e-3, 1e-4, 0.001, 128, 64, 1000, 0.3, True, "original_mse")
HYPERPARAM_TABLE = {
    "flagship":      _FLAG,
    "flagship_flat": _FLAG,
    "flagship_bf16": _FLAG,
    "flagship_bf16sr": _FLAG,
    # large-batch throughput preset: the flagship recipe with batch 256
    # (a deliberate relaxation of train.py:209, NOT a reference config —
    # qualified by the 3-seed study in SEED_REPEAT.json)
    "flagship_bf16_bs256": (1e-3, 1e-4, 0.001, 256, 64, 1000, 0.3, True,
                            "original_mse"),
    # bs-512 + sqrt-scaled lr under warmup+cosine (this framework's
    # qualified large-batch recipe, NOT a reference config — 3-seed
    # study in SEED_REPEAT.json beats the f32 flagship envelope)
    "flagship_bf16_bs512_wc": (2e-3, 1e-4, 0.001, 512, 64, 1000, 0.3,
                               True, "original_mse"),
    # bs-1024 under warmup+cosine — the promoted production preset.
    # lr history: 2.83e-3 (sqrt-scaled, round 4); re-promoted at
    # 3.2e-3 in round 5 (6-seed study, SEED_REPEAT.json: better mean
    # AND worst-case RMSE at ~4x tighter seed spread)
    "flagship_bf16_bs1024_wc": (3.2e-3, 1e-4, 0.001, 1024, 64, 1000,
                                0.3, True, "original_mse"),
    "model6":        _FLAG,
    "model1": (1e-4, 0.0, 0.0, 64, 32, 1000, 0.2, False, "val_mse"),
    "model2": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.2, False, "val_mse"),
    "model3": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.2, False, "val_mse"),
    "model4": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.3, False, "val_mse"),
    "model5": (5e-3, 0.0, 0.001, 128, 64, 1000, 0.3, False, "val_mse"),
    "gcn": (5.9e-4, 0.0, 0.0, 32, 32, 10, 0.1, False, "val_mse"),
    "graphsage": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.2, False, "val_mse"),
    "gat": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.2, False, "val_mse"),
    "gat_gcn": (1e-4, 0.0, 0.0, 64, 32, 1000, 0.2, False, "val_mse"),
    "gin": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.2, False, "val_mse"),
    "chebnet": (5e-3, 0.0, 0.0, 128, 64, 1000, 0.2, False, "val_mse"),
    "morgan1024": _FLAG,
    "morgan2048": _FLAG,
    "ecfp2048": _FLAG,
    "fcfp": _FLAG,
    "maccs": _FLAG,
    "smifp": _FLAG,
    "bci": _FLAG,
}


def test_hyperparam_table_covers_every_preset():
    assert set(HYPERPARAM_TABLE) == set(PRESETS)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_hyperparameters_match_reference(name):
    (lr, wd, kl, bs, ebs, epochs, dropout, scale,
     select) = HYPERPARAM_TABLE[name]
    cfg = get_config(name)
    assert cfg.lr == lr, name
    assert cfg.weight_decay == wd, name
    assert cfg.kl_lambda == kl, name
    assert cfg.batch_size == bs, name
    assert cfg.eval_batch_size == ebs, name
    assert cfg.epochs == epochs, name
    assert cfg.graph_dropout == dropout, name
    assert cfg.scale_targets == scale, name
    assert cfg.select_metric == select, name


def test_preset_structure_flags_match_reference():
    """Architecture axes beyond the numeric table."""
    m2 = get_config("model2")
    assert not m2.residual and m2.dual_pool   # ablation/model 2.py:78
    m3 = get_config("model3")
    assert m3.residual and m3.dual_pool       # ablation/model 3.py:78
    m1 = get_config("model1")
    assert m1.attention == "gat10" and m1.sage_features == 350
    assert get_config("gcn").featurizer == "5"    # gnn/gcn.py:21-29,43
    assert get_config("flagship_flat").flat_attention
    assert get_config("ecfp2048").fingerprint == "ecfp2048"
    assert get_config("maccs").fingerprint == "maccs"
    for name in ("model1", "model2", "model3", "gcn", "graphsage", "gat",
                 "gat_gcn", "gin", "chebnet"):
        assert get_config(name).fingerprint is None, name


# (preset, fp_dim, cnn fc1 width) pinned against the reference scripts:
# every CNNNet keeps fc1 = Linear(128*nbits, 256) — train.py:133,
# fingerprint/morgan=1024.py:125, morgan=2048.py:125, fcfp.py:125,
# maccs.py:125, SMIFP.py:157, BCI.py:220 — EXCEPT ecfp=2024.py:125 (512).
FP_CNN_TABLE = [
    ("flagship", 1024, 256),
    ("morgan1024", 1024, 256),
    ("morgan2048", 2048, 256),   # NOT widened, unlike ecfp2048
    ("ecfp2048", 2048, 512),
    ("fcfp", 1024, 256),
    ("maccs", 167, 256),
    ("smifp", 1024, 256),
    ("bci", 1024, 256),
]


@pytest.mark.parametrize("name,fp_dim,fc_hidden", FP_CNN_TABLE)
def test_fingerprint_cnn_fc1_widths_match_reference(name, fp_dim,
                                                    fc_hidden):
    """The morgan2048 preset must NOT share ecfp2048's 512-wide fc1 —
    they are distinct reference experiments (VERDICT r1 #1)."""
    import jax
    import jax.numpy as jnp

    from mgat_graphsage_tpu.chem.fingerprints import FINGERPRINT_DIMS
    from mgat_graphsage_tpu.train.trainer import build_model

    cfg = get_config(name)
    assert FINGERPRINT_DIMS[cfg.fingerprint] == fp_dim
    assert cfg.cnn_fc_hidden == fc_hidden
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 35)), jnp.zeros((1, 4, 4)),
                           jnp.ones((1, 4)), jnp.zeros((1, fp_dim)))
    fc1_kernel = variables["params"]["cnn"]["fc1"]["kernel"]
    assert fc1_kernel.shape == (128 * fp_dim, fc_hidden), name
