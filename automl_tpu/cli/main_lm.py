"""LM training CLI (the reference's hero/main.py).

Examples:
  python -m automl_tpu.cli.main_lm --model_dir=/tmp/lm --train_steps=50 \
    --experiment_config="model_dim=256,n_layers=4,seq_len=512" \
    --mesh_shape=1,2,4
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--model_dir", required=True)
  p.add_argument("--config_name", default="",
                 help="named experiment config (lm-flops2e17/1e18/1e19, "
                      "lm-test — the hero Chinchilla C4 scaling ladder, "
                      "ref: hero/config_lib.py:234-349)")
  p.add_argument("--experiment_config", default="",
                 help="override string onto lm_defaults()")
  p.add_argument("--sharding_config", default="gspmd",
                 choices=["gspmd", "dp", "sp", "fsdp"],
                 help="gspmd = hero tensor-parallel pspecs; dp = replicated "
                      "weights; sp = sequence-parallel (ring attention over "
                      "'model'; pair with use_ring_attention=true); fsdp = "
                      "ZeRO-3-style weights+opt-state sharded over 'data'")
  p.add_argument("--mesh_shape", default=None, help="e.g. 1,2,4")
  p.add_argument("--dcn_mesh_shape", default=None,
                 help="multi-slice outer mesh, e.g. 2,1,1 (DCN axis; "
                      "ref: hero/main.py:42-46)")
  p.add_argument("--coordinator_address", default=None,
                 help="host:port for jax.distributed multi-process runs")
  p.add_argument("--num_processes", type=int, default=None)
  p.add_argument("--process_id", type=int, default=None)
  p.add_argument("--train_steps", type=int, default=None,
                 help="default: config.num_train_steps")
  p.add_argument("--learning_rate", type=float, default=None)
  p.add_argument("--optimizer", default=None)
  p.add_argument("--prefix_lm", action="store_true",
                 help="treat --train_file/--valid_file lines as "
                      "input<TAB>target pairs and train a prefix-LM "
                      "(bidirectional attention over inputs, loss on "
                      "targets; ref: hero/data_lib.py:185-190)")
  p.add_argument("--train_file", default=None,
                 help="text file of documents (blank-line separated); "
                      "default: synthetic copy-task data")
  p.add_argument("--valid_file", default=None,
                 help="held-out text file for periodic validation")
  p.add_argument("--tokenizer", default="byte",
                 help="'byte' or a path to a SentencePiece .model blob")
  p.add_argument("--lr_schedule", default=None,
                 choices=[None, "cosine_decay", "constant"])
  p.add_argument("--warmup_steps", type=int, default=None,
                 help="0 = auto (min(1000, steps/10))")
  p.add_argument("--eval_every", type=int, default=None,
                 help="validation interval in steps (0 = off)")
  p.add_argument("--eval_steps", type=int, default=None)
  p.add_argument("--ckpt_every", type=int, default=0)
  p.add_argument("--deep_diagnostics", action="store_true",
                 help="log global+per-param norm/rms of weights/grads/"
                      "updates (ref: hero/model_lib.py:1852-1888)")
  p.add_argument("--batch_size", type=int, default=None)
  p.add_argument("--compilation_cache_dir", default=None,
                 help="persistent XLA compile cache; 'auto' = ~/.cache/automl_tpu/xla")
  p.add_argument("--seed", type=int, default=0)
  return p.parse_args(argv)


def main(argv=None):
  args = parse_args(argv)
  # must run before any jax backend use (multi-process runs only)
  from automl_tpu.parallel import distributed
  distributed.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
  if args.compilation_cache_dir:
    from automl_tpu.utils import enable_compilation_cache
    enable_compilation_cache(None if args.compilation_cache_dir == "auto"
                             else args.compilation_cache_dir)
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.train import lm_trainer

  config = lm_lib.get_lm_config(args.config_name)
  config.override(args.experiment_config)
  # CLI flags (when given) take precedence over the named config's values.
  for flag, key in [("train_steps", "num_train_steps"),
                    ("learning_rate", "learning_rate"),
                    ("optimizer", "optimizer"),
                    ("lr_schedule", "lr_schedule"),
                    ("warmup_steps", "warmup_steps"),
                    ("eval_every", "eval_every"),
                    ("eval_steps", "eval_steps"),
                    ("batch_size", "batch_size")]:
    v = getattr(args, flag)
    if v is not None:
      config[key] = v
  sharding = {"gspmd": lm_lib.ShardingConfig,
              "dp": lm_lib.ShardingConfig.data_parallel,
              "sp": lm_lib.ShardingConfig.sequence_parallel,
              "fsdp": lm_lib.ShardingConfig.fsdp}[
                  args.sharding_config]()
  if args.sharding_config == "sp":
    config.use_ring_attention = True
  mesh_shape = (tuple(int(x) for x in args.mesh_shape.split(","))
                if args.mesh_shape else None)
  data_iter = None
  eval_iter = None
  if args.train_file:
    from automl_tpu.data.lm_pipeline import (ByteTokenizer, PackedLMLoader,
                                             PrefixLMLoader,
                                             SentencePieceModel)
    tok = (ByteTokenizer() if args.tokenizer == "byte"
           else SentencePieceModel(args.tokenizer))
    config.vocab_size = max(config.vocab_size, tok.vocab_size)
    if args.prefix_lm:
      def read_pairs(path):
        with open(path) as f:
          return [tuple(l.split("\t", 1)) for l in f.read().splitlines()
                  if "\t" in l]
      data_iter = iter(PrefixLMLoader(read_pairs(args.train_file),
                                      config.batch_size, config.seq_len,
                                      tokenizer=tok))
      if args.valid_file:
        eval_iter = PrefixLMLoader(read_pairs(args.valid_file),
                                   config.batch_size, config.seq_len,
                                   tokenizer=tok, repeat=False)
    else:
      data_iter = iter(PackedLMLoader.from_text_file(
          args.train_file, config.batch_size, config.seq_len, tokenizer=tok))
      if args.valid_file:
        eval_iter = PackedLMLoader.from_text_file(
            args.valid_file, config.batch_size, config.seq_len, tokenizer=tok,
            repeat=False)
  dcn_mesh_shape = (tuple(int(x) for x in args.dcn_mesh_shape.split(","))
                    if args.dcn_mesh_shape else None)
  logs = lm_trainer.run_lm(
      config, args.model_dir, config.num_train_steps, sharding=sharding,
      mesh_shape=mesh_shape, dcn_mesh_shape=dcn_mesh_shape,
      data_iter=data_iter,
      learning_rate=config.learning_rate,
      lr_schedule=config.lr_schedule, warmup_steps=config.warmup_steps,
      eval_iter=eval_iter, eval_every=config.eval_every,
      eval_steps=config.eval_steps, ckpt_every=args.ckpt_every,
      deep_diagnostics=args.deep_diagnostics,
      optimizer=config.optimizer, seed=args.seed)
  print({k: round(v, 4) for k, v in logs.items()
         if not k.startswith("diag/")})
  return logs


if __name__ == "__main__":
  main()
