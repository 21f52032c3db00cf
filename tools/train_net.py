"""Training CLI (reference `tools/train_net.py:72-117` contract).

    python tools/train_net.py --config-file configs/step1_bbox.yaml \
        [--resume] [--eval-only] [key.path value ...]

Config files use the snake_case YAML schema of `articulation3d_tpu.config`;
`opts` are dotted-path overrides (e.g. `solver.base_lr 0.002`).  Multi-device
data parallelism is automatic over all visible devices (SPMD mesh) — the
reference's `--num-gpus N` process-launch model has no analog here.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_opts(opts):
    """['a.b.c', 'v', ...] -> nested override dict."""
    import ast
    out = {}
    for key, val in zip(opts[::2], opts[1::2]):
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--max-iter", type=int, default=None,
                        help="override solver.max_iter")
    # multi-host launch contract (reference d2 launch() --num-machines /
    # --machine-rank / --dist-url, `tools/train_net.py:107-117`): one
    # process per host; also honors JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    parser.add_argument("--dist-url", default=None,
                        help="coordinator address host:port for multi-host "
                             "runs (jax.distributed.initialize)")
    parser.add_argument("--num-machines", type=int, default=None)
    parser.add_argument("--machine-rank", type=int, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")

    from articulation3d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    from articulation3d_tpu.parallel import init_distributed
    init_distributed(coordinator_address=args.dist_url,
                     num_processes=args.num_machines,
                     process_id=args.machine_rank)

    from articulation3d_tpu.config import load_config
    from articulation3d_tpu.train.trainer import Trainer

    cfg = load_config(args.config_file, parse_opts(args.opts))
    os.makedirs(cfg.output_dir, exist_ok=True)

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        results = trainer.test()
        print(results)
        return
    trainer.train(max_iter=args.max_iter)


if __name__ == "__main__":
    main()
