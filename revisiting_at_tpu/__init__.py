"""revisiting_at_tpu — a TPU-native adversarial-training & robustness-evaluation framework.

A from-scratch JAX/XLA/pjit/Pallas rebuild of the capabilities of
nmndeep/revisiting-at ("Revisiting Adversarial Training for ImageNet",
NeurIPS 2023): ConvNeXt/ViT ImageNet classifiers with ConvStem variants,
in-training APGD/FGSM adversarial example generation fused into a single
jitted train step, the full modern training recipe (RandAugment, MixUp/CutMix,
label smoothing, model EMA, AdamW, cosine LR, bf16), and a batched AutoAttack
evaluator (APGD-CE, APGD-T, FAB-T, Square) sharded over a TPU mesh.

Design notes (TPU-first, not a port):
  * images are NHWC, values in [0, 1]; attacks operate in pixel space
  * params are float32, compute is bfloat16 (no loss scaling needed)
  * the adversarial inner loop is a `lax.scan` inside the jitted train step,
    so adversarial example generation never leaves the chip
  * parallelism is a `jax.sharding.Mesh` with named axes ("data", "fsdp");
    gradient reduction is implicit via NamedSharding/pjit (no process groups)
"""

__version__ = "0.1.0"
