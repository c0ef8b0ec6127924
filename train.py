"""SAT-TPU training entry point (reference: train.py:16-292).

Usage mirrors the reference CLI:
    python train.py --json data/coco/128k256.json --batch 32 --epochs 60 \
        --encoder_arch shufflenet_v2_x0_5 --pretrained --deep_output \
        --decoder_tf inv_sigmoid --scheduler plateau ...
"""

from sat_tpu.config import config_from_args
from sat_tpu.utils.seeding import seed_everything


def main(argv=None):
    from sat_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # SAT_TPU_PLATFORM=cpu routes the run off-chip
    cfg = config_from_args(argv)
    if cfg.resume:
        # Lightning-style resume: the model/optimizer structure comes from the
        # checkpoint's stored config; only runtime knobs stay from the CLI.
        from sat_tpu.train.checkpoints import read_checkpoint_config
        ck = read_checkpoint_config(cfg.resume)
        cfg = ck.replace(resume=cfg.resume, epochs=cfg.epochs, name=cfg.name,
                         json=cfg.json or ck.json, workers=cfg.workers,
                         val_interval=cfg.val_interval,
                         val_percent=cfg.val_percent,
                         profile_dir=cfg.profile_dir)
    seed_everything(cfg.seed)
    from sat_tpu.train.loop import Trainer  # defer jax init until after seeding
    print(f" * Effective Batch Size = {cfg.batch * cfg.accumulate}")
    trainer = Trainer(cfg)
    metrics = trainer.fit()
    print("final validation:", metrics)
    return metrics


if __name__ == "__main__":
    main()
