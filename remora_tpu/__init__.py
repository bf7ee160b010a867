"""remora_tpu: a TPU-native modified-base calling framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
nanoporetech/remora (reference layout surveyed in SURVEY.md): dataset
preparation from POD5 signal + BAM alignments, Conv/ConvLSTM chunk
classifier training, streaming modified-base inference writing MM/ML
tags, and k-mer level signal-mapping refinement via a banded DP.

Compute-path design is TPU-first:
  * models are pure-functional JAX pytrees jitted over static chunk shapes
  * the encoded k-mer featurizer and the refinement DP run as batched
    XLA/Pallas programs rather than per-read C loops
  * multi-device scale-out uses a jax.sharding.Mesh with psum/allgather
    collectives (see remora_tpu.parallel)

Host-side I/O (BAM, POD5) is implemented natively in this package (no
pysam/pod5 dependency): see remora_tpu.io.
"""

__version__ = "0.1.0"


class RemoraError(Exception):
    """Custom error for remora_tpu (mirrors reference src/remora/__init__.py)."""
