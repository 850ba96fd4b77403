"""mapf_gpt_tpu — a TPU-native MAPF engine (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of CognitiveAISystems/MAPF-GPT:

- pure-JAX vectorized POGEMA-style grid environment (``envs/``),
- on-device observation tokenization fused with the env step (``ops/``),
- batched non-causal GPT policy in flax (``models/``),
- sharded rollout + data-parallel training over a device mesh (``parallel/``,
  ``train/``),
- benchmark harness with grid-search expansion and CSR/ISR/SoC metrics
  (``eval/``),
- LaCAM* expert + imitation dataset pipeline (``dataset/``, ``native/``).

The reference implementation is cited throughout as ``ref:<path>:<lines>``
relative to the MAPF-GPT repo.
"""

__version__ = "0.1.0"
