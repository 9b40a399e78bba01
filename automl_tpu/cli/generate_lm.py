"""Text generation from a trained LM checkpoint (hero LMInterface.generate
analog, ref: hero/model_lib.py:1958-2186 prefill+decode serving path).

Examples:
  python -m automl_tpu.cli.generate_lm --model_dir=/tmp/lm \
    --prompt="Once upon a time" --max_new_tokens=128 \
    --temperature=0.8 --top_k=40
  echo "prompt per line" | python -m automl_tpu.cli.generate_lm \
    --model_dir=/tmp/lm --tokenizer=/ckpts/vb32000_t5_cc.model --int8
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--model_dir", required=True,
                 help="run_lm output dir (experiment_config.yaml + ckpt/)")
  p.add_argument("--prompt", default=None,
                 help="prompt text; default: one prompt per stdin line")
  p.add_argument("--max_new_tokens", type=int, default=128)
  p.add_argument("--temperature", type=float, default=0.0,
                 help="0 = greedy")
  p.add_argument("--top_k", type=int, default=0)
  p.add_argument("--top_p", type=float, default=0.0)
  p.add_argument("--stop_at_eos", action="store_true",
                 help="exit decode as soon as every row emitted EOS "
                      "(hero continue_decode stop semantics)")
  p.add_argument("--tokenizer", default="byte",
                 help="'byte' or a SentencePiece .model path (must match "
                      "training)")
  p.add_argument("--int8", action="store_true",
                 help="serve with int8-quantized weights (2x less memory)")
  p.add_argument("--step", type=int, default=None,
                 help="checkpoint step (default: latest)")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--draft_model_dir", default=None,
                 help="run_lm dir of a SMALL draft model (same tokenizer): "
                      "enables speculative decoding — n_draft tokens are "
                      "drafted cheaply and verified by ONE target forward; "
                      "output is token-exact vs plain decode at "
                      "temperature=0")
  p.add_argument("--n_draft", type=int, default=4,
                 help="drafted tokens per speculative iteration")
  p.add_argument("--num_beams", type=int, default=1,
                 help="> 1: length-penalized beam search (greedy/sampling "
                      "flags are ignored; not with --serve_slots/"
                      "--draft_model_dir)")
  p.add_argument("--length_penalty", type=float, default=0.6,
                 help="GNMT length normalization exponent for --num_beams")
  p.add_argument("--stop", action="append", default=None,
                 help="stop text (repeatable): generation ends as soon as "
                      "the output ends with any stop's token sequence "
                      "(multi-token analog of --stop_at_eos; the matched "
                      "stop stays in the output)")
  p.add_argument("--logprobs", action="store_true",
                 help="print each generated token's log-probability "
                      "(raw-softmax) after the completion")
  p.add_argument("--serve_mode", choices=["none", "tp", "sp"],
                 default="none",
                 help="sharded serving over a 'model'-axis mesh: tp = "
                      "heads sharded (serve_tp, sharded head-leading KV "
                      "cache + shard_map'd decode kernel), sp = sequence-"
                      "sharded KV cache (serve_sp, long-context partial-"
                      "merge decode). Both compose with --serve_slots. "
                      "Pair with --mesh_model.")
  p.add_argument("--mesh_model", type=int, default=0,
                 help="'model' mesh-axis size for --serve_mode "
                      "(0 = all available devices)")
  p.add_argument("--system_prompt", default=None,
                 help="shared prefix text prepended to every prompt; its "
                      "KV is computed once (prefix caching) under "
                      "--serve_slots")
  p.add_argument("--prefill_chunk", type=int, default=0,
                 help="chunked prefill: prompts longer than this prefill "
                      "in chunks interleaved with decode bursts "
                      "(--serve_slots only; 0 = whole-prompt prefill)")
  p.add_argument("--serve_slots", type=int, default=0,
                 help="N > 0: run ALL prompts through the continuous-"
                      "batching server (N decode slots over one KV cache; "
                      "finished prompts free their slot immediately) "
                      "instead of one sequential generate per prompt")
  return p.parse_args(argv)


def load_model(model_dir: str, step=None, int8: bool = False,
               serve_mode: str = "none"):
  """(config, model, params) from a run_lm model_dir."""
  import jax
  import jax.numpy as jnp
  from automl_tpu.config import Config
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.train import lm_trainer
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train.checkpoint import CheckpointManager

  config = Config({}).update(
      os.path.join(model_dir, "experiment_config.yaml"))
  if serve_mode == "tp":    # heads sharded over 'model' (docs/lm.md)
    config.override(dict(serve_tp=True), allow_new_keys=True)
  elif serve_mode == "sp":  # sequence-sharded KV cache (long context)
    config.override(dict(serve_sp=True), allow_new_keys=True)
  sharding = (lm_lib.ShardingConfig() if serve_mode == "tp"
              else lm_lib.ShardingConfig.data_parallel())
  model = lm_lib.TransformerLM(config, sharding)
  shapes = jax.eval_shape(model.init, jax.random.key(0))
  template = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), shapes)
  # schedule-callable lr so the opt-state template matches run_lm's
  # (a float lr yields EmptyState where a schedule has a countdown state)
  tx = opt_lib.build_optimizer(config.get("optimizer", "lion"),
                               lambda step: 1e-3)
  state_template = lm_trainer.LMTrainState(
      jnp.zeros((), jnp.int32), template, tx.init(template))
  mngr = CheckpointManager(os.path.join(model_dir, "ckpt"))
  state = mngr.restore(state_template, step=step)
  if state is None:
    raise FileNotFoundError(f"no checkpoint under {model_dir}/ckpt")
  params = state.params
  if int8:
    params = lm_lib.quantize_lm_params(params)
  return config, model, params


def main(argv=None):
  args = parse_args(argv)
  import contextlib
  import jax
  ctx = contextlib.nullcontext()
  if args.serve_mode != "none":
    # sharded serving: 'model'-axis mesh over the available devices
    from automl_tpu.parallel import create_mesh
    n_dev = len(jax.devices())
    n_model = args.mesh_model or n_dev
    if n_dev % n_model:
      raise ValueError(f"--mesh_model {n_model} does not divide the "
                       f"{n_dev} available devices")
    ctx = jax.set_mesh(create_mesh((1, n_dev // n_model, n_model)))
  with ctx:
    return _run(args)


def _run(args):
  import jax
  import jax.numpy as jnp
  import numpy as np
  from automl_tpu.data.lm_pipeline import ByteTokenizer, SentencePieceModel
  from automl_tpu.models.lm import greedy_generate
  from automl_tpu.data import lm_pipeline

  config, model, params = load_model(args.model_dir, args.step, args.int8,
                                     serve_mode=args.serve_mode)
  if args.num_beams > 1 and (args.serve_slots or args.draft_model_dir
                             or args.stop or args.logprobs):
    raise ValueError("--num_beams > 1 runs standalone beam search; it does "
                     "not compose with --serve_slots, --draft_model_dir, "
                     "--stop or --logprobs")
  draft = None
  if args.draft_model_dir:
    if args.stop or args.logprobs:
      raise ValueError("--stop/--logprobs are not supported with "
                       "--draft_model_dir (speculative decoding verifies "
                       "whole chunks); drop one or the other")
    from automl_tpu.models.speculative import speculative_generate
    draft = load_model(args.draft_model_dir, None, args.int8)
  tok = (ByteTokenizer() if args.tokenizer == "byte"
         else SentencePieceModel(args.tokenizer))

  prompts = ([args.prompt] if args.prompt is not None
             else [ln.rstrip("\n") for ln in sys.stdin if ln.strip()])
  stops = ([list(tok.encode(t)) for t in args.stop] if args.stop else None)
  outputs = []
  if args.serve_slots > 0:
    from automl_tpu.inference.lm_server import GenRequest, LMServer
    server = LMServer(
        model, params, max_batch=args.serve_slots,
        max_seq_len=int(config.seq_len), temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, seed=args.seed,
        eos_id=(lm_pipeline.EOS_ID if args.stop_at_eos else None),
        stop_sequences=stops, want_logprobs=args.logprobs,
        prefill_chunk=args.prefill_chunk or None)
    reqs = [GenRequest(tok.encode(t), args.max_new_tokens) for t in prompts]
    prefix = (list(tok.encode(args.system_prompt))
              if args.system_prompt else None)
    for text, res in zip(prompts, server.serve(reqs, shared_prefix=prefix)):
      completion = tok.decode(list(res.tokens))
      outputs.append(completion)
      print(f"=== {text!r}\n{completion}")
      if args.logprobs:
        print("logprobs:", [round(v, 4) for v in res.logprobs])
    return outputs
  for i, text in enumerate(prompts):
    ids = np.asarray(tok.encode(text), np.int32)[None]
    common = dict(
        rng=jax.random.key(args.seed + i), temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
        eos_id=(lm_pipeline.EOS_ID if args.stop_at_eos else None))
    if args.num_beams > 1:
      from automl_tpu.models.beam import beam_search_generate
      out, score = beam_search_generate(
          model, params, jnp.asarray(ids), args.max_new_tokens,
          num_beams=args.num_beams, length_penalty=args.length_penalty,
          eos_id=(lm_pipeline.EOS_ID if args.stop_at_eos else None))
    elif draft is not None:
      out = speculative_generate(
          model, params, draft[1], draft[2], jnp.asarray(ids),
          args.max_new_tokens, n_draft=args.n_draft, **common)
    else:
      out = greedy_generate(model, params, jnp.asarray(ids),
                            args.max_new_tokens, stop_sequences=stops,
                            return_logprobs=args.logprobs, **common)
    lps = None
    if args.logprobs and not isinstance(out, jax.Array):
      out, lps = out
    new_ids = [int(t) for t in np.asarray(out)[0, ids.shape[1]:]]
    if args.stop_at_eos or stops:
      # Early-exited rows emit pad (0) after the eos/stop: truncate at
      # the FIRST eos/stop match rather than blindly stripping zeros (a
      # budget-exhausted row may legitimately end in token 0).
      seq = [int(t) for t in ids[0]] + new_ids
      t0 = ids.shape[1]
      for j in range(len(new_ids)):
        at_eos = args.stop_at_eos and new_ids[j] == lm_pipeline.EOS_ID
        at_stop = stops and any(
            len(seq[:t0 + j + 1]) >= len(ss)
            and seq[:t0 + j + 1][-len(ss):] == ss for ss in stops)
        if at_eos or at_stop:
          new_ids = new_ids[:j + 1]
          break
    completion = tok.decode(new_ids)
    outputs.append(completion)
    print(f"=== {text!r}\n{completion}")
    if lps is not None:
      print("logprobs:", [round(float(v), 4) for v in np.asarray(lps)[0]])
  return outputs


if __name__ == "__main__":
  main()
