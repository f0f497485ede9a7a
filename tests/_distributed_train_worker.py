"""Worker for tests/test_distributed.py: one of N processes in a
jax.distributed CPU run of the classifier trainer (fit(distributed=True)).

argv: coordinator_port process_id num_processes data_dir out_npz [n_local_devices]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices",
                  int(sys.argv[6]) if len(sys.argv) > 6 else 1)

import numpy as np


def main():
    port, pid, pcount, data_dir, out_npz = sys.argv[1:6]
    from gen_adversarial_tpu.core.distributed import maybe_initialize
    ok = maybe_initialize(coordinator_address=f"localhost:{port}",
                          num_processes=int(pcount), process_id=int(pid))
    assert ok and jax.process_count() == int(pcount)

    import gen_adversarial_tpu.train.classifier as tc
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    TINY_PLAN = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")
    tc.make_classifier = lambda t, n: VGG11BN(n_classes=n, plan=TINY_PLAN)

    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    tds = ImageLabelDataset(f"{data_dir}/train", 32)
    vds = ImageLabelDataset(f"{data_dir}/validation", 32)
    state, history = tc.fit("vgg", 2, 32, tds, vds, epochs=1, lr=1e-3,
                            batch_size=4, seed=7, log_fn=lambda s: None,
                            distributed=True)
    for h in history:
        print(f"[worker {pid}] epoch={h['epoch']} loss={h['loss']:.6f} "
              f"acc={h['acc']:.4f}", flush=True)
    if int(pid) == 0:
        leaves = jax.tree_util.tree_leaves_with_path(jax.device_get(state.params))
        np.savez(out_npz, **{jax.tree_util.keystr(k): np.asarray(v)
                             for k, v in leaves})


if __name__ == "__main__":
    main()
