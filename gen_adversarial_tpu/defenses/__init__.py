from gen_adversarial_tpu.defenses.base import (
    ClassifierDefense, MLVGMDefense, make_classifier_apply, make_classifier_fn)
from gen_adversarial_tpu.defenses.eot import eot_wrap
