"""tpuflow — TPU-native TM-Glow turbulence-surrogate framework.

A brand-new JAX / XLA / Flax / Pallas implementation of the capability
surface of ``zabaras/deep-turbulence`` (TM-Glow: Geneva & Zabaras,
"Multi-fidelity Generative Deep Learning of Turbulent Flows",
Foundations of Data Science 2(4) 2020, arXiv:2006.04731).

Provenance note: the reference mount at /root/reference was empty during
both the survey and build sessions, so parity citations in this package
point at the paper (arXiv:2006.04731 section/eq numbers) and at
SURVEY.md sections rather than reference file:line.

Subpackages
-----------
flows     invertible bijector library (ActNorm, LU Inv1x1, affine
          coupling, squeeze, conditional split-prior)
kernels   Pallas TPU kernels (fused coupling apply + logdet)
models    LF conditioning encoder, ConvLSTM recurrence, TM-Glow
data      trajectory archives, normalization, BPTT windowing, synthetic
          fixtures for the two cases (backward-step, cylinder-array)
train     NLL loss, truncated-BPTT train step, mesh/sharding, Orbax
          checkpointing
eval      lax.scan ensemble rollout, physics statistics (TKE, moments),
          plotting
utils     logging / profiling helpers
cli       train / rollout / evaluate entry points
"""

__version__ = "0.1.0"
