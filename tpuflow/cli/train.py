"""Train a TM-Glow model on a case (SURVEY.md §3.1 / L4 entry point).

Usage: python -m tpuflow.cli.train <case> [key=value ...]
"""

from __future__ import annotations

import pathlib

from tpuflow.cli import as_console_script, parse_args
from tpuflow.train.trainer import Trainer
from tpuflow.utils.logging import MetricsLogger


def main(argv=None) -> dict:
    cfg = parse_args(argv)
    log_path = pathlib.Path(cfg.train.checkpoint_dir) / cfg.name / "train_log.csv"
    logger = MetricsLogger(
        log_path, tensorboard_dir=cfg.train.tensorboard_dir or None
    )
    trainer = Trainer(cfg, logger=logger)
    try:
        trainer.init_or_resume()
        final = trainer.run()
    finally:
        # Flush/close the TensorBoard writer: tf buffers events (~2 min
        # flush interval), so exiting without close() can drop the tail
        # of the run's scalars. CSV is flushed per row regardless.
        logger.close()
    print(
        f"done: epoch={final.get('epoch')} "
        f"mean_bpd={final.get('mean_bpd', float('nan')):.4f} "
        f"windows/s={final.get('windows_per_sec', 0.0):.2f}"
    )
    return final


if __name__ == "__main__":
    main()


cli = as_console_script(main)
