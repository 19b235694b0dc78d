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


def test_preset_hyperparameters_match_reference():
    """Spot-check the preset table against the reference scripts."""
    f = get_config("flagship")
    assert (f.lr, f.weight_decay, f.kl_lambda) == (1e-3, 1e-4, 0.001)
    assert (f.batch_size, f.eval_batch_size, f.epochs) == (128, 64, 1000)
    assert f.scale_targets and f.select_metric == "original_mse"

    g = get_config("gcn")
    assert (g.lr, g.epochs, g.batch_size) == (5.9e-4, 10, 32)
    assert g.featurizer == "5"

    gg = get_config("gat_gcn")
    assert (gg.lr, gg.batch_size, gg.eval_batch_size) == (1e-4, 64, 32)

    m2 = get_config("model2")
    assert not m2.residual and m2.dual_pool and m2.lr == 5e-3

    m5 = get_config("model5")
    assert m5.kl_lambda == 0.001 and not m5.scale_targets

    assert get_config("ecfp2048").fingerprint == "ecfp2048"
    assert get_config("maccs").fingerprint == "maccs"


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
