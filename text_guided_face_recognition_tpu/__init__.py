"""TGFR-TPU: a TPU-native (JAX/XLA/Pallas) framework for Text-Guided Face Recognition.

A from-scratch rebuild of the capabilities of the WACV 2024 "Text-Guided Face
Recognition" reference (Mahedi-61/Text_Guided_Face_Recognition) designed for
TPUs: pure-functional flax models, XLA-fused multi-granularity contrastive
losses (with optional Pallas kernels), pjit/shard_map data parallelism over a
`jax.sharding.Mesh`, and Orbax checkpointing.

Layout:
  config    — typed config system mirroring the reference cfg/*.yml surface
  models    — face backbones (iResNet / IR-SE), text encoders (BERT / BiLSTM),
              projection heads (FCAM), fusion nets (FCFM), margin classifiers
  ops       — DAMSM word-region attention + contrastive losses (jnp + Pallas)
  parallel  — mesh construction, sharding rules, global-negative collectives
  data      — caption tokenization, datasets, image transforms, host loader
  engine    — train states, stage-1/stage-2 training steps, eval, checkpoints
  utils     — verification metrics (AUC/EER/TPR@FPR), logging
"""

__version__ = "0.1.0"
