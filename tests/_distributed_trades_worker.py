"""Worker for tests/test_distributed.py: one of N processes running the
TRADES fine-tune CLI (--distributed) on CPU, in a tiny world (32px,
2 classes, tiny VGG plan, 2 inner PGD steps).

argv: coordinator_port process_id num_processes data_dir clf_ckpt out_dir
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

TINY_PLAN = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")


def main():
    port, pid, pcount, data_dir, ckpt, out_dir = sys.argv[1:7]
    if int(pcount) > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        os.environ["JAX_NUM_PROCESSES"] = pcount
        os.environ["JAX_PROCESS_ID"] = pid

    import gen_adversarial_tpu.models.classifiers as mc
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    mc.make_classifier = lambda t, n: VGG11BN(n_classes=2, plan=TINY_PLAN)
    from gen_adversarial_tpu.core.config import IMAGE_SIZE, N_CLASSES
    IMAGE_SIZE["ids"] = 32
    N_CLASSES["ids"] = 2
    import gen_adversarial_tpu.train.trades as tt
    make_orig = tt.make_trades_train_step
    tt.make_trades_train_step = (
        lambda beta, epsilon: make_orig(beta, epsilon, perturb_steps=2))

    sys.argv = ["trades_finetune", "--data-path", data_dir,
                "--experiment", "ids", "--classifier-path", ckpt,
                "--epochs", "1", "--lr", "1e-3", "--cumulative-bs", "4",
                "--seed", "3", "--out", out_dir]
    if int(pcount) > 1:
        sys.argv.append("--distributed")
    from gen_adversarial_tpu.cli.trades_finetune import main as cli_main
    cli_main()


if __name__ == "__main__":
    main()
