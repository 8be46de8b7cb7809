"""hello_tpu — a TPU-native small-variant calling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HELLO
(anands-repo/hello): Illumina / PacBio / hybrid SNV+indel calling with a
Mixture-of-Experts read-convolver network, plus the training system behind it.

Layout:
  hello_tpu.io        — FASTA / BAM / VCF / BED readers and writers (host side)
  hello_tpu.reads     — read model, filters, clipping
  hello_tpu.counts    — per-position allele counting + hotspot detection
  hello_tpu.assembly  — aligned-pairs extraction, allele assembly, support maps
  hello_tpu.featurize — DeepVariant-style colored pileup feature tensors
  hello_tpu.nn        — config-driven JAX network builder + MoE model
  hello_tpu.ops       — segment reductions and Pallas TPU kernels
  hello_tpu.parallel  — device mesh / sharding utilities
  hello_tpu.train     — loss, data store, loader, schedules, trainer
  hello_tpu.pipeline  — end-to-end calling and training-data drivers
"""

__version__ = "0.1.0"
