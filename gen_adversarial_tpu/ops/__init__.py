from gen_adversarial_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_ref, make_fir_kernel
from gen_adversarial_tpu.ops.fused_act import fused_leaky_relu
from gen_adversarial_tpu.ops.blur import gaussian_blur2d, gaussian_kernel1d
from gen_adversarial_tpu.ops.image import resize_bilinear, adaptive_avg_pool
