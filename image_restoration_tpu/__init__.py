"""image_restoration_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image & license-plate
restoration framework with the capability surface of ChuRuaNh0/Image_Restoration.

Layout (mirrors SURVEY.md layer map, re-designed TPU-first):
  ops/       — XLA/Pallas compute primitives (upfirdn2d, fused bias-act,
               modulated conv, per-sample filtering, resize, DiffJPEG)
  archs/     — flax network definitions (RRDBNet, SRVGG, GFPGAN-OCR,
               StyleGAN2, discriminators, RetinaFace detector, ...)
  losses/    — loss registry (L1/Charbonnier/Sobel/Perceptual/GAN/R1...)
  metrics/   — PSNR / SSIM / NIQE
  data/      — on-device degradation synthesis + host-side loading
  models/    — trainer state machines (SR, SRGAN, ESRGAN, GFPGAN, ...)
  parallel/  — mesh construction, sharding rules, spatial halo tiling
  convert/   — PyTorch .pth → pytree weight importers
  serve/     — product API (detect → crop → restore → paste-back)
"""

__version__ = "0.1.0"
