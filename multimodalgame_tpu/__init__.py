"""MultimodalGame-TPU: a TPU-native (JAX/XLA/pjit/Pallas) framework for the
multi-modal, multi-step referential game of arXiv:1705.10369.

This is a ground-up, TPU-first re-design with the same capabilities as the
reference implementation (nyu-dl/MultimodalGame):

- A **Sender** agent that sees ResNet-34 image features and emits a binary
  (or continuous) message.
- A **Receiver** agent holding GloVe-CBOW class-description embeddings,
  running a GRU over incoming messages, predicting the image class, and
  answering with a binary query (plus an adaptive STOP bit).
- A multi-step **exchange engine** compiled as a single ``jax.lax.scan`` so
  fixed-length and adaptive conversations are the *same* XLA program, with
  adaptive termination realized through mask propagation.
- REINFORCE training with learned value baselines, entropy regularization,
  and four logically-independent optimizers fused into one jitted train step.
- Data-parallel scale-out over a ``jax.sharding.Mesh`` with XLA collectives.

Reference parity citations in docstrings use ``file:line`` into the upstream
tree (e.g. ``model.py:725`` is the reference exchange loop).
"""

__version__ = "0.1.0"
