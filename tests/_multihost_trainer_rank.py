"""Full-Trainer rank worker for tests/test_multihost.py.

Runs the REAL Trainer.fit() as one host of a 2-host deployment: process-
sharded loaders, global batch assembly, allgathered beam validation, one
writer process.  Writes the final metrics + logdir as JSON."""

import json
import os
import sys


def main():
    rank, port, out_path, ds_json, log_root = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(rank)
    os.environ["JAX_CPU_COLLECTIVES"] = "gloo"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sat_tpu.parallel.mesh import maybe_initialize_distributed
    assert maybe_initialize_distributed()
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    from sat_tpu.config import SATConfig
    from sat_tpu.train.loop import Trainer
    cfg = SATConfig(json=ds_json, batch=8, epochs=2, input_size=32,
                    encoder_arch="shufflenet_v2_x0_5", encoder_dim=32,
                    embed_dim=16, attention_dim=16, decoder_dim=32,
                    decoder_tf="always", val_interval=1, val_beamk=2,
                    val_max_len=6, deep_output=True, seed=0, workers=0)
    trainer = Trainer(cfg, log_root=log_root)
    metrics = trainer.fit()
    with open(out_path, "w") as f:
        json.dump({"rank": rank, "logdir": trainer.logdir,
                   "is_main": trainer.is_main,
                   "metrics": {k: float(v) for k, v in metrics.items()}}, f)
    print(f"rank{rank} fit done: {metrics}", flush=True)
    # Align ranks before process exit: jax's atexit distributed shutdown runs
    # a coordination-service barrier with a fixed deadline, and after fit()'s
    # last collective the writer rank still flushes checkpoints/logs — under a
    # loaded 1-core CI host that skew alone can blow the shutdown deadline
    # (the non-writer rank reaches the barrier minutes earlier).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("trainer_rank_exit")


if __name__ == "__main__":
    main()
