"""TPU-native multimodal Alzheimer's classification framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
ADNI pipeline (Liz490/multimodal_alzheimer): multimodal pairing of 3D tau-PET,
3D T1w MRI and tabular clinical features, a 3-stage late-fusion model zoo,
weighted-CE/focal losses, bootstrap evaluation metrics, and data-parallel
training over a TPU device mesh.

Design stance (vs the reference, see SURVEY.md):
  * compute path is jit-compiled XLA with Pallas kernels for preprocessing
    (the reference does per-sample normalization in 32 DataLoader worker
    processes; here it runs fused on-device),
  * models are functional flax modules returning logits *and* embedding taps
    (the reference performs post-hoc ``nn.Sequential`` surgery to extract
    fusion features),
  * parallelism is GSPMD over a ``jax.sharding.Mesh`` (the reference is
    single-GPU).
"""

__version__ = "0.1.0"
