"""Worker for tests/test_distributed.py: one of N processes in a
jax.distributed CPU run of the eval harness.

argv: coordinator_port process_id num_processes data_dir config_yaml results_dir
      [n_local_devices] [n_mesh_devices]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices",
                  int(sys.argv[7]) if len(sys.argv) > 7 else 1)


def main():
    port, pid, pcount, data_dir, config, results_dir = sys.argv[1:7]
    n_devices = int(sys.argv[8]) if len(sys.argv) > 8 else None
    from gen_adversarial_tpu.core.distributed import maybe_initialize
    ok = maybe_initialize(coordinator_address=f"localhost:{port}",
                          num_processes=int(pcount), process_id=int(pid))
    assert ok and jax.process_count() == int(pcount)

    import gen_adversarial_tpu.eval.factory as factory
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    TINY_PLAN = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")
    factory.make_classifier = lambda t, n: VGG11BN(n_classes=100, plan=TINY_PLAN)

    from gen_adversarial_tpu.eval.harness import run_benchmark
    loaded = factory.load_defense(config)
    results = run_benchmark(loaded, data_dir, results_dir, batch_size=2,
                            attack_filter="deepfool", plots=False,
                            log_fn=lambda s: None, distributed=True,
                            n_devices=n_devices)
    print(f"[worker {pid}] clean={results['Clean']:.4f} "
          f"n={len(results['DeepFool'])}", flush=True)


if __name__ == "__main__":
    main()
