"""m-gat-graphsage_tpu: a TPU-native molecular property prediction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``JiaCZ-Computational-Biology/M-GAT-GraphSAGE`` (reference mounted at
/root/reference): SMILES featurization, a model zoo of graph neural networks
(Modified-GAT hybrid, GCN/GraphSAGE/GAT/GAT-GCN/GIN/ChebNet baselines),
fingerprint CNN branches, a jitted trainer with data-parallel sharding over a
TPU mesh, evaluation/metrics, gradient-based interpretability, and a
classical-ML comparison harness.
"""

__version__ = "0.1.0"
