"""gen_adversarial_tpu: a TPU-native (JAX/XLA/Pallas) framework for adversarial
purification with pre-trained Multi-Latent-Variable Generative Models (MLVGMs).

Re-designed from scratch for TPU hardware, with the capabilities of the
reference CUDA/torch codebase (SerezD/gen_adversarial, WACV 2025):

- ``ops``       TPU kernels: upfirdn2d (XLA + Pallas), fused bias+LeakyReLU,
                gaussian blur, image resize.
- ``models``    Flax model zoo: NVAE, StyleGAN2 (+E4E encoder,
                Style-Transformer encoder), classifiers (ResNet50 / VGG11-BN /
                ResNeXt50), competitor purifiers (A-VAE, ND-VAE).
- ``attacks``   Batched, jit-compiled L2 attacks: FGSM, DeepFool, C&W, APGD
                (CE/DLR), FAB, AutoAttack ensemble.
- ``defenses``  Purification defenses (latent interpolation against sampled
                priors), ablations, competitor wrappers, EoT via vmap.
- ``train``     Data-parallel trainers (classifier, TRADES, A-VAE, ND-VAE).
- ``eval``      Attack-benchmark harness producing results.json.
- ``search``    Alpha-schedule search (grid + JAX-native Bayesian optimization).
- ``parallel``  Mesh/sharding utilities (DP over ICI; collectives via psum).
"""

__version__ = "0.1.0"
