"""
Benchmark: COOT retrieval training throughput (clips/sec/chip).

Workload mirrors the reference's YouCook2 "2d3d" headline config
(config/retrieval/paper2020/yc2_2d3d_coot.yaml: batch 64, max_frames 80,
vid_feat_dim 4096, text_feat_dim 1536, ~7.7 clips+sentences per video,
attention dropout 0.01, frame noise 0.01, RAdam + contrastive +
cycle-consistency losses) through the production fast path: HBM-resident
feature store + device-side sampling + scan-fused multi-step dispatch
(tasks/retrieval/steps.py make_retrieval_train_scan — the same program
RetrievalTrainer dispatches when train.steps_per_dispatch > 1).

The synthetic features are generated DIRECTLY ON DEVICE (jitted normal
draws into the store arrays) and the per-datapoint metadata tables are
built on host from the same clip/duration distribution the synthetic
dataset generator uses — the bench ships only a few KB over the
host->device link before the timed region. (Round 1 shipped a ~1 GB
synthetic h5 through the tunnel and blew the driver budget; the gather/
sample/model/optimizer path being timed is byte-identical.)

Timing methodology: on this environment the TPU is reached through a
tunnel where jax.block_until_ready does NOT synchronize; completion is
forced by fetching a scalar that depends on the updated parameters, and
the per-step time is the difference quotient between a 1-group and an
N-group dispatch chain (cancelling the constant dispatch+fetch latency).

DRIVER-PROOFING (round 3): this script ALWAYS prints exactly one JSON
line to stdout, within BENCH_DEADLINE seconds (default 390), whatever
happens. A parent process (no jax import — the TPU plugin handshake
itself can hang when the tunnel is wedged) runs the actual benchmark in
a worker subprocess, retries transient backend-init failures
(UNAVAILABLE) with backoff, and on unrecoverable failure emits
{"metric": ..., "value": null, "unit": ..., "vs_baseline": null,
 "error": ..., "stage": ...} so the driver's parse never comes up empty.
Stage timestamps go to stderr so any timeout is diagnosable from the log
tail. The persistent XLA compile cache (.jax_cache/) is shared across
invocations, so a bench run warmed in-session makes the driver's run
skip the program compiles entirely.

Baseline derivation (no throughput numbers exist in the reference; see
BASELINE.md): README.md:158 reports 1.45 +/- 0.41 h total training
wall-clock for yc2_2d3d on 1 GPU over the 1333-video / ~10.3k-clip train
split for ~80 epochs => ~122 clips/s reference throughput per GPU.
vs_baseline = ours / 122.

The JSON line additionally reports achieved model FLOP/s and MFU. The
FLOP count is analytic (documented in flops_per_retrieval_step below):
2*matmul_params per token for every dense contraction in the 4-network
forward + the attention score/value quadratics, times 3 for
forward+backward. At these model sizes (d=384, L<=80, batch 64) the
step is bandwidth/overhead-bound, not MXU-bound; measured MFU is ~0.20
on v5e (2026-08-19). The number is emitted so the claim is auditable.

A second mode (BENCH_MODE=caption, or `python bench.py caption`) benches
the MART captioning train step at the yc2_100m_coot_vidclip_mart workload
shape (batch 16, 12 sentence steps, hidden 768, 2 layers, 12 heads,
vocab 992 = the reference's yc2 mart_word2idx.json) with the same
chain-difference methodology, reporting words/s/chip. Its baseline is an
ESTIMATE (the reference publishes no caption throughput at all): the
reference torch MART measured on this host CPU (795 words/s, 1 core)
scaled by the GPU/CPU ratio observed for the retrieval workload on the
same host (122 clips/s GPU from README.md:158 wall-clock / 32.1 clips/s
CPU measured = 3.8x) => ~3.0k words/s. The default (retrieval) run the
driver invokes ALSO runs the caption mode in its leftover budget and
merges its numbers into the same JSON line as caption_* fields, so
BENCH_r*.json carries both workloads; retrieval additionally reports a
value_min/value_max spread over BENCH_TIMING_REPS timed chains.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REFERENCE_CLIPS_PER_SEC = 122.0
# estimated reference GPU caption throughput (see module docstring):
# 795 words/s torch-CPU x 3.8 retrieval GPU/CPU ratio on the same host
REFERENCE_CAPTION_WORDS_PER_SEC = 3.0e3
REFERENCE_DECODE_TOKENS_PER_SEC = 398.0

_MODE_UNITS = {
    "retrieval": ("train_clips_per_sec_per_chip", "clips/s/chip"),
    "caption": ("caption_words_per_sec_per_chip", "words/s/chip"),
    "decode": ("caption_decode_tokens_per_sec_per_chip", "tokens/s/chip"),
}

# peak dense bf16 FLOP/s per chip by device kind (public spec sheets)
_PEAK_BF16 = (
    ("v5p", 459e12),
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v6", 918e12),
    ("trillium", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)

_T0 = time.perf_counter()
_LAST_STAGE = "startup"


def stage(msg: str) -> None:
    global _LAST_STAGE
    _LAST_STAGE = msg
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)
    # mirror the stage to a file so the parent watchdog can report where a
    # hung worker died even when SIGTERM can't preempt a blocked XLA call
    path = os.environ.get("BENCH_STAGE_FILE")
    if path:
        try:
            with open(path, "w") as fh:
                fh.write(msg)
        except OSError:
            pass


def peak_bf16_flops(device_kind: str):
    kind = device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


def _matmul_param_count(tree) -> int:
    """Total elements of >=2-D parameter leaves (every dense contraction
    weight; excludes 1-D LayerNorm scales/biases)."""
    import jax
    return sum(int(np.prod(leaf.shape))
               for leaf in jax.tree_util.tree_leaves(tree)
               if getattr(leaf, "ndim", 0) >= 2)


def flops_per_retrieval_step(params, shapes, bsz: int,
                             hidden: int = 384, n_layers: int = 1) -> float:
    """Analytic model FLOPs of ONE train step (fwd+bwd) of the 4-network
    hierarchy. Dense contractions: 2*params*tokens per net (each net runs
    over its own token stream); attention score+value quadratics:
    4*L*hidden per token per self-attn layer. Backward = 2x forward.
    """
    tokens = {
        "net_video_local": bsz * shapes["lv"]
        + shapes["pack_clips"] * shapes["lc"],
        "net_text_local": bsz * shapes["lp"]
        + shapes["pack_sents"] * shapes["ls"],
        # global nets run over the part sequence + 1 cross-attn query
        "net_video_global": bsz * (shapes["n_parts"] + 1),
        "net_text_global": bsz * (shapes["n_parts"] + 1),
    }
    attn_tok_l2 = {
        "net_video_local": bsz * shapes["lv"] ** 2
        + shapes["pack_clips"] * shapes["lc"] ** 2,
        "net_text_local": bsz * shapes["lp"] ** 2
        + shapes["pack_sents"] * shapes["ls"] ** 2,
        "net_video_global": bsz * shapes["n_parts"] ** 2,
        "net_text_global": bsz * shapes["n_parts"] ** 2,
    }
    fwd = 0.0
    for net, toks in tokens.items():
        fwd += 2.0 * _matmul_param_count(params[net]) * toks
        fwd += 4.0 * hidden * n_layers * attn_tok_l2[net]
    return 3.0 * fwd


def flops_per_caption_step(params, s: int, n: int, length: int,
                           hidden: int = 768, n_layers: int = 2) -> float:
    """Analytic MART train-step FLOPs: the recurrent forward processes the
    full (S,N,L) joint sequence every sentence step."""
    tokens = s * n * length
    fwd = 2.0 * _matmul_param_count(params) * tokens
    fwd += 4.0 * hidden * n_layers * s * n * length ** 2
    return 3.0 * fwd


def build_tables(num_videos: int, *, mean_clips: float, max_clips: int,
                 fps: float, mean_duration_sec: float,
                 tokens_per_sentence: int, seed: int):
    """
    Per-datapoint metadata in the RetrievalDeviceMeta.tables schema
    (data/device_store.py), drawn from the same distribution as
    data/synthetic.py generate_retrieval_dataset. Returns
    (tables: dict of np arrays, total_frames, total_tokens, total_clips).
    """
    rng = np.random.RandomState(seed)
    n_parts_max = max_clips
    vid_off = np.zeros(num_videos, np.int32)
    vid_nf = np.zeros(num_videos, np.int32)
    seg_off = np.zeros((num_videos, n_parts_max), np.int32)
    seg_nf = np.zeros((num_videos, n_parts_max), np.int32)
    seg_valid = np.zeros((num_videos, n_parts_max), bool)
    clip_num = np.zeros(num_videos, np.int32)
    text_off = np.zeros(num_videos, np.int32)
    sent_len = np.zeros((num_videos, n_parts_max), np.int32)
    sent_off = np.zeros((num_videos, n_parts_max), np.int32)
    sent_num = np.zeros(num_videos, np.int32)
    par_len = np.zeros(num_videos, np.int32)

    frame_ptr = 0
    tok_ptr = 0
    total_clips = 0
    for i in range(num_videos):
        n_clips = int(np.clip(rng.poisson(mean_clips - 1) + 1, 1,
                              max_clips))
        duration = max(20.0, rng.normal(mean_duration_sec,
                                        mean_duration_sec / 4))
        num_frames = int(duration * fps)
        bounds = np.sort(rng.choice(
            np.arange(1, num_frames - 1), size=max(n_clips - 1, 0),
            replace=False)) if n_clips > 1 else np.array([], int)
        starts = np.concatenate([[0], bounds]).astype(int)
        stops = np.concatenate([bounds, [num_frames]]).astype(int)

        vid_off[i] = frame_ptr
        vid_nf[i] = num_frames
        clip_num[i] = n_clips
        text_off[i] = tok_ptr
        sent_num[i] = n_clips
        for j in range(n_clips):
            seg_off[i, j] = frame_ptr + starts[j]
            seg_nf[i, j] = stops[j] - starts[j]
            seg_valid[i, j] = True
            sent_len[i, j] = tokens_per_sentence
            sent_off[i, j] = tok_ptr + j * tokens_per_sentence
        par_len[i] = n_clips * tokens_per_sentence
        frame_ptr += num_frames
        tok_ptr += n_clips * tokens_per_sentence
        total_clips += n_clips

    tables = {
        "vid_off": vid_off, "vid_nf": vid_nf,
        "seg_off": seg_off, "seg_nf": seg_nf,
        "seg_valid": seg_valid, "clip_num": clip_num,
        "sent_len": sent_len, "sent_off": sent_off,
        "sent_num": sent_num, "par_len": par_len,
        "text_off": text_off,
    }
    return tables, frame_ptr, tok_ptr, total_clips


def _relay_down() -> str:
    """Health-probe the axon relay (the local end of the TPU tunnel,
    /root/.tpu_init.py listening on 127.0.0.1:8082+). Returns a
    diagnosis string when the relay is provably dead (connection
    refused), else "". Observed 2026-08-21: the relay process exits
    when the OUTER host closes its stdio channel; every later backend
    init then hangs for the worker's whole budget — failing fast with a
    clear reason (and letting the parent's backoff retry re-probe)
    keeps the error line diagnosable and cheap."""
    if os.environ.get("JAX_PLATFORMS", "axon") not in ("axon", ""):
        return ""  # cpu/other backends don't need the tunnel
    import socket
    try:
        s = socket.create_connection(("127.0.0.1", 8082), timeout=3)
        s.close()
        return ""
    except ConnectionRefusedError:
        return ("axon relay down: connection refused on 127.0.0.1:8082 "
                "(tunnel endpoint /root/.tpu_init.py not running — "
                "host-side transport closed; no client-side remedy)")
    except OSError:
        return ""  # listener exists but busy/slow: proceed to real init


def _setup_jax():
    # persistent compilation cache: the second bench invocation (e.g. the
    # driver's) skips the program compile entirely
    cache_dir = Path(__file__).resolve().parent / ".jax_cache"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(cache_dir))

    down = _relay_down()
    if down:
        stage(down)
        raise RuntimeError(down)

    # NOTE: on this environment `import jax` itself performs the TPU
    # plugin handshake; if the tunnel is wedged (observed after a client
    # was SIGKILLed mid-dispatch) the import blocks forever — this stage
    # line makes that failure mode diagnosable from stderr alone, and the
    # parent watchdog bounds it.
    stage("importing jax (TPU plugin handshake)")
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # this environment's sitecustomize registers the TPU plugin in a way
    # that overrides the JAX_PLATFORMS env var; honoring it explicitly
    # keeps `JAX_PLATFORMS=cpu python bench.py` runnable off-TPU
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    stage("jax imported; querying backend")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")
    return jax


def run_caption() -> dict:
    """MART caption train-step throughput (words/s/chip)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from coot_videotext_tpu.parallel.mesh import (
        get_mesh, replicated_sharding)
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)
    from coot_videotext_tpu.tasks.caption.steps import (
        init_caption_train_state, make_caption_train_step,
        stacked_batch_sharding)
    from coot_videotext_tpu.train.optim import make_bertadam
    from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file

    stage(f"jax ready, backend={jax.default_backend()}")
    yaml_path = (Path(__file__).resolve().parent / "config" / "caption"
                 / "paper2020" / "yc2_100m_coot_vidclip_mart.yaml")
    cfg = MartConfig(load_yaml_config_file(yaml_path))
    vocab = 992  # len(reference annotations/youcook2/mart_word2idx.json)
    model = create_mart_model(cfg, vocab, verbose=False)

    s, n = cfg.max_n_sen, cfg.train.batch_size
    length = cfg.max_v_len + cfg.max_t_len
    rng_np = np.random.RandomState(0)
    # realistic yc2 step/sentence structure: ~7.7 sentences per video
    # padded to max_n_sen with IGNORE dummy steps (reference
    # recursive_caption_dataset.py collate), ~8.8 words per sentence
    n_sen = np.clip(rng_np.poisson(6.7, n) + 1, 1, s)
    sen_len = np.clip(rng_np.normal(8.8, 2.5, (s, n)).round().astype(int),
                      4, cfg.max_t_len - 2)
    ids = rng_np.randint(7, vocab, (s, n, length)).astype(np.int32)
    labels = np.full((s, n, length), -1, np.int32)
    mask = np.zeros((s, n, length), np.float32)
    mask[:, :, :cfg.max_v_len] = 1.0
    for i in range(s):
        for j in range(n):
            if i >= n_sen[j]:
                mask[i, j, :] = 0.0  # IGNORE dummy step
                continue
            t = int(sen_len[i, j]) + 2  # [BOS] words [EOS]
            mask[i, j, cfg.max_v_len:cfg.max_v_len + t] = 1.0
            labels[i, j, cfg.max_v_len:cfg.max_v_len + t - 1] = \
                ids[i, j, cfg.max_v_len + 1:cfg.max_v_len + t]
    tokty = np.concatenate(
        [np.zeros((s, n, cfg.max_v_len), np.int32),
         np.ones((s, n, cfg.max_t_len), np.int32)], axis=-1)
    words_per_step = int((labels != -1).sum())
    stage(f"batch built: S={s} N={n} L={length} "
          f"words/step={words_per_step}")

    mesh = get_mesh()
    n_chips = mesh.devices.size
    rep = replicated_sharding(mesh)
    sh = stacked_batch_sharding(mesh)

    @jax.jit
    def gen_feat(key):
        return jax.random.normal(
            key, (s, n, length, cfg.video_feature_size), jnp.float32)

    batch = {
        "input_ids": jax.device_put(jnp.asarray(ids), sh),
        "input_labels": jax.device_put(jnp.asarray(labels), sh),
        "input_mask": jax.device_put(jnp.asarray(mask), sh),
        "token_type_ids": jax.device_put(jnp.asarray(tokty), sh),
        "video_feature": jax.device_put(
            gen_feat(jax.random.PRNGKey(7)), sh),
    }

    optimizer = make_bertadam(eps=cfg.eps)
    state = init_caption_train_state(
        model, optimizer, jax.random.PRNGKey(0), batch,
        ema_decay=cfg.ema_decay)
    state = jax.device_put(state, rep)
    flops_step = flops_per_caption_step(
        state.params, s, n, length, hidden=cfg.hidden_size,
        n_layers=cfg.num_hidden_layers)
    step = make_caption_train_step(
        model, optimizer, ema_decay=cfg.ema_decay,
        clip_gradient=float(cfg.train.clip_gradient), mesh=mesh)
    lr = jnp.float32(cfg.lr)
    rng = jax.random.PRNGKey(1)
    stage("model/step built, starting compile+warmup")

    def sync(st):
        return float(jnp.mean(jax.tree_util.tree_leaves(
            st.params)[0].astype(jnp.float32)))

    state, metrics = step(state, batch, lr, jax.random.fold_in(rng, 0))
    sync(state)
    stage("warmup step done (compile finished)")

    t0 = time.perf_counter()
    state, metrics = step(state, batch, lr, jax.random.fold_in(rng, 1))
    sync(state)
    t_one = time.perf_counter() - t0
    stage(f"1-step chain: {t_one:.3f}s")

    # N-step chains, repeated for a variance estimate like the retrieval
    # worker (each chain ~0.2s; a transient server-side slowdown during a
    # single chain skewed a caption capture by 30% on 2026-08-21 — the
    # median over reps is robust to that)
    n_steps = int(os.environ.get("BENCH_CAPTION_STEPS", "16"))
    n_reps = int(os.environ.get("BENCH_TIMING_REPS", "3"))
    per_steps = []
    g_base = 2
    for rep in range(n_reps):
        t0 = time.perf_counter()
        for g in range(g_base, g_base + n_steps):
            state, metrics = step(state, batch, lr,
                                  jax.random.fold_in(rng, g))
        sync(state)
        t_many = time.perf_counter() - t0
        g_base += n_steps
        per_steps.append((t_many - t_one) / (n_steps - 1))
        stage(f"{n_steps}-step chain rep {rep + 1}/{n_reps}: "
              f"{t_many:.3f}s")

    per_step = float(np.median(per_steps))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"
    words_per_sec_chip = words_per_step / per_step / n_chips
    result = {
        "metric": "caption_words_per_sec_per_chip",
        "value": round(words_per_sec_chip, 2),
        "unit": "words/s/chip",
        "vs_baseline": round(
            words_per_sec_chip / REFERENCE_CAPTION_WORDS_PER_SEC, 3),
        "value_min": round(
            words_per_step / max(per_steps) / n_chips, 2),
        "value_max": round(
            words_per_step / min(per_steps) / n_chips, 2),
        "timing_reps": n_reps,
    }
    result.update(_perf_extras(jax, flops_step, per_step, n_chips))
    stage(f"per_step={per_step * 1e3:.2f}ms  loss={loss:.4f}")
    return result


def _perf_extras(jax, flops_step: float, per_step: float,
                 n_chips: int) -> dict:
    """Achieved FLOP/s + MFU fields for the result JSON."""
    achieved = flops_step / per_step / n_chips
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    peak = peak_bf16_flops(str(kind))
    out = {
        "backend": jax.default_backend(),
        "device_kind": str(kind),
        "per_step_ms": round(per_step * 1e3, 3),
        "model_flops_per_step": round(flops_step),
        "model_flops_per_sec_per_chip": round(achieved),
        "flops_method": "analytic-matmul (2*params*tokens + attn, x3 bwd)",
    }
    if peak is not None and jax.default_backend() == "tpu":
        out["mfu"] = round(achieved / peak, 5)
        out["mfu_peak_flops_bf16"] = peak
    return out


def run_decode() -> dict:
    """MART greedy decode throughput (free-running translation — the
    reference's validation hot loop, translator.py:201-234: one full
    forward per generated token, no KV cache, UNK suppressed, EOS
    re-masking + memory rebuild per sentence; here the WHOLE batch —
    all S sentence fori_loops — is ONE jitted program and ONE device
    dispatch). Reports decoded token positions/s/chip
    (S x N x max_t_len per batch call). Baseline ESTIMATE (the reference
    publishes no decode throughput): the reference torch translator
    measured on this host CPU (104.7 tokens/s at these shapes, 1 core)
    times the same 3.8x retrieval GPU/CPU host ratio => ~398 tokens/s."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from coot_videotext_tpu.parallel.mesh import get_mesh
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)
    from coot_videotext_tpu.tasks.caption.translator import Translator
    from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file

    stage(f"jax ready, backend={jax.default_backend()}")
    yaml_path = (Path(__file__).resolve().parent / "config" / "caption"
                 / "paper2020" / "yc2_100m_coot_vidclip_mart.yaml")
    cfg = MartConfig(load_yaml_config_file(yaml_path))
    vocab = 992
    model = create_mart_model(cfg, vocab, verbose=False)

    s, n = cfg.max_n_sen, int(os.environ.get("BENCH_DECODE_BATCH", "50"))
    length = cfg.max_v_len + cfg.max_t_len
    rng_np = np.random.RandomState(0)
    ids = rng_np.randint(7, vocab, (s, n, length)).astype(np.int32)
    mask = np.ones((s, n, length), np.float32)
    tokty = np.concatenate(
        [np.zeros((s, n, cfg.max_v_len), np.int32),
         np.ones((s, n, cfg.max_t_len), np.int32)], axis=-1)
    feats = rng_np.randn(s, n, length,
                         cfg.video_feature_size).astype(np.float32)

    import jax.random as jrandom
    from coot_videotext_tpu.tasks.caption.steps import (
        init_caption_train_state)
    from coot_videotext_tpu.train.optim import make_bertadam
    batch = {"input_ids": jnp.asarray(ids),
             "input_labels": jnp.asarray(np.full_like(ids, -1)),
             "input_mask": jnp.asarray(mask),
             "token_type_ids": jnp.asarray(tokty),
             "video_feature": jnp.asarray(feats)}
    params = init_caption_train_state(
        model, make_bertadam(), jrandom.PRNGKey(0), batch,
        ema_decay=0).params
    translator = Translator(model, lambda: params, cfg)
    n_chips = get_mesh().devices.size

    # device-resident inputs: the timed chain measures the decode loop,
    # not the host->device feature transfer (the torch baseline is
    # likewise measured with RAM-resident tensors; on this tunneled
    # host the one-time 69 MB transfer would otherwise dominate at
    # ~3.6s/call, see docs/PERFORMANCE.md round-5 decode notes)
    d_ids = jnp.asarray(ids)
    d_feats = jnp.asarray(feats)
    d_mask = jnp.asarray(mask)
    d_tokty = jnp.asarray(tokty)
    jax.block_until_ready(d_feats)

    def decode_once():
        out = translator.translate_batch_greedy(d_ids, d_feats, d_mask,
                                                d_tokty)
        return out[-1]  # host numpy per sentence => already synced

    stage("compiling decode programs (warmup)")
    decode_once()
    stage("warmup done")
    t0 = time.perf_counter()
    decode_once()
    t_one = time.perf_counter() - t0
    stage(f"1-call chain: {t_one:.3f}s")
    k = int(os.environ.get("BENCH_DECODE_CALLS", "4"))
    t0 = time.perf_counter()
    for _ in range(k):
        last = decode_once()
    t_many = time.perf_counter() - t0
    stage(f"{k}-call chain: {t_many:.3f}s")
    per_call = (t_many - t_one) / (k - 1)
    tokens_per_call = s * n * cfg.max_t_len
    tok_s = tokens_per_call / per_call / n_chips
    assert last.shape == (n, cfg.max_t_len)
    result = {
        "metric": "caption_decode_tokens_per_sec_per_chip",
        "value": round(tok_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_s / REFERENCE_DECODE_TOKENS_PER_SEC, 3),
        "backend": jax.default_backend(),
        "per_call_ms": round(per_call * 1e3, 3),
    }
    stage(f"per_call={per_call:.3f}s")
    return result


def run_retrieval() -> dict:
    jax = _setup_jax()
    import jax.numpy as jnp

    from coot_videotext_tpu.data.retrieval_dataset import (
        COUNT_LADDER, LENGTH_LADDER, bucket_size)
    from coot_videotext_tpu.parallel.mesh import (
        get_mesh, replicated_sharding)
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from coot_videotext_tpu.tasks.retrieval.model_manager import (
        RetrievalModelManager)
    from coot_videotext_tpu.tasks.retrieval.steps import (
        TrainState, make_retrieval_train_scan)
    from coot_videotext_tpu.train.optim import make_optimizer
    from tests.helpers import retrieval_config_dict

    stage(f"jax ready, backend={jax.default_backend()}")

    # ---- workload metadata (host, a few KB) ----
    num_videos = 192
    bsz = 64
    max_frames = 80
    vid_dim, text_dim = 4096, 1536
    tables_np, total_frames, total_tokens, total_clips = build_tables(
        num_videos, mean_clips=7.7, max_clips=16, fps=1.0,
        mean_duration_sec=320.0, tokens_per_sentence=18, seed=0)

    shapes = {
        "lv": bucket_size(
            min(max_frames, int(tables_np["vid_nf"].max())), LENGTH_LADDER),
        "lc": bucket_size(
            min(max_frames, int(tables_np["seg_nf"].max())), LENGTH_LADDER),
        "ls": bucket_size(18, LENGTH_LADDER),
        "lp": bucket_size(int(tables_np["par_len"].max()), LENGTH_LADDER),
        "n_parts": bucket_size(int(tables_np["clip_num"].max()),
                               COUNT_LADDER),
    }
    n_parts = shapes["n_parts"]

    def budget(counts):
        top = sorted(counts, reverse=True)[:bsz]
        need = sum(top) + bsz
        return min(-(-need // 64) * 64, bsz * n_parts)

    shapes["pack_clips"] = budget(tables_np["clip_num"].tolist())
    shapes["pack_sents"] = budget(tables_np["sent_num"].tolist())
    stage(f"tables built: {total_frames} frames / {total_tokens} tokens / "
          f"{total_clips} clips, shapes={shapes}")

    # ---- config (yc2_2d3d network dims, bf16) ----
    overrides = {"vid_feat_dim": vid_dim, "text_feat_dim": text_dim}
    cfg_dict = retrieval_config_dict(overrides, batch_size=bsz,
                                     num_epochs=1)
    for net in ("net_video_local", "net_text_local"):
        cfg_dict[net].update({"output_dim": 384})
        cfg_dict[net]["input_fc_config"]["output_dim"] = 384
        cfg_dict[net]["selfatn_config"].update(
            {"hidden_dim": 384, "num_heads": 8, "pointwise_ff_dim": 384,
             "dropout": 0.01})
        cfg_dict[net]["pooler_config"].update(
            {"hidden_dim": 768, "num_heads": 2, "dropout": 0.01})
    for net in ("net_video_global", "net_text_global"):
        cfg_dict[net].update({"output_dim": 768})
        cfg_dict[net]["selfatn_config"].update(
            {"hidden_dim": 384, "num_heads": 8, "pointwise_ff_dim": 384,
             "dropout": 0.01})
        cfg_dict[net]["crossatn_config"].update(
            {"hidden_dim": 384, "num_heads": 8, "pointwise_ff_dim": 384,
             "dropout": 0.01})
    cfg_dict["dataset_train"]["max_frames"] = max_frames
    cfg_dict["dataset_val"]["max_frames"] = max_frames
    cfg_dict["dataset_train"]["frames_noise"] = 0.01
    cfg_dict["fp16_train"] = True
    cfg_dict["optimizer"]["lr"] = 3.6e-4
    cfg = RetrievalConfig(cfg_dict)

    mesh = get_mesh()
    n_chips = mesh.devices.size
    rep = replicated_sharding(mesh)

    # ---- feature stores generated ON DEVICE (no bulk host->device) ----
    store_dtype = jnp.bfloat16

    @partial(jax.jit, static_argnums=(1, 2))
    def gen_store(key, n_rows, dim):
        return jax.random.normal(key, (n_rows, dim), store_dtype)

    kv, kt = jax.random.split(jax.random.PRNGKey(42))
    vid_store = jax.device_put(
        gen_store(kv, total_frames, vid_dim), rep)
    text_store = jax.device_put(
        gen_store(kt, total_tokens, text_dim), rep)
    tables = {k: jax.device_put(v, rep) for k, v in tables_np.items()}
    stage(f"stores generated on device: "
          f"{(total_frames * vid_dim + total_tokens * text_dim) * 2 / 1e9:.2f}"
          " GB HBM")

    # ---- model + optimizer + scan step ----
    mgr = RetrievalModelManager(cfg)
    stage("model manager built")
    params = mgr.init_params(0)
    stage("params initialized")
    flops_step = flops_per_retrieval_step(params, shapes, bsz)
    optimizer = make_optimizer(cfg.optimizer)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    stage("optimizer state built")
    state = jax.device_put(state, rep)
    lw = cfg.train.contrastive_loss_config.as_dict()
    sampling = {"shapes": shapes, "max_frames": max_frames}
    scan_step = make_retrieval_train_scan(
        mgr.model_train, optimizer, loss_weights=lw,
        margin=cfg.train.contrastive_loss_config.margin,
        loss_cycle_cons=cfg.train.loss_cycle_cons,
        clip_gradient=-1, mesh=mesh,
        frames_noise=cfg.dataset_train.frames_noise,
        device_sampling=sampling)
    lr = jnp.float32(3.6e-4)
    stage("model/step built, starting compile+warmup")

    steps_per_epoch = num_videos // bsz
    group_size = int(os.environ.get("BENCH_GROUP_SIZE", "8"))
    n_groups = int(os.environ.get("BENCH_GROUPS", "4"))

    def group_ids(g):
        # each group = group_size shuffled steps (epoch-style passes)
        rows = []
        grng = np.random.RandomState(1000 + g)
        while len(rows) < group_size:
            order = np.arange(num_videos)
            grng.shuffle(order)
            rows.extend(order[:steps_per_epoch * bsz].reshape(
                steps_per_epoch, bsz))
        return jnp.asarray(np.stack(rows[:group_size]), jnp.int32)

    bv = jnp.ones((group_size, bsz), bool)
    sv = jnp.ones((group_size,), bool)
    rng = jax.random.PRNGKey(0)

    def sync(st):
        # force completion: fetch a value that depends on the new params
        return float(jnp.mean(jax.tree_util.tree_leaves(
            st.params)[0].astype(jnp.float32)))

    # warmup: compile + settle
    state, metrics = scan_step(state, group_ids(0), bv, sv, lr,
                               jax.random.fold_in(rng, 0),
                               vid_store, text_store, tables)
    sync(state)
    stage("warmup group done (compile finished)")

    # 1-group chain (captures dispatch+fetch constant)
    t0 = time.perf_counter()
    state, metrics = scan_step(state, group_ids(1), bv, sv, lr,
                               jax.random.fold_in(rng, 1),
                               vid_store, text_store, tables)
    sync(state)
    t_one = time.perf_counter() - t0
    stage(f"1-group chain: {t_one:.3f}s")

    # N-group chains, repeated for a variance estimate (each ~1.4s; the
    # ~±3% run-to-run noise is characterized in docs/PERFORMANCE.md —
    # report the spread instead of a single point)
    n_reps = int(os.environ.get("BENCH_TIMING_REPS", "3"))
    per_steps = []
    g_base = 2
    for rep in range(n_reps):
        t0 = time.perf_counter()
        for g in range(g_base, g_base + n_groups):
            state, metrics = scan_step(state, group_ids(g), bv, sv, lr,
                                       jax.random.fold_in(rng, g),
                                       vid_store, text_store, tables)
        sync(state)
        t_many = time.perf_counter() - t0
        g_base += n_groups
        per_steps.append((t_many - t_one) / ((n_groups - 1) * group_size))
        stage(f"{n_groups}-group chain rep {rep + 1}/{n_reps}: "
              f"{t_many:.3f}s")

    per_step = float(np.median(per_steps))
    loss = float(jax.device_get(metrics["loss_total"][-1]))
    assert np.isfinite(loss), f"non-finite loss {loss}"

    clips_per_step = total_clips / steps_per_epoch
    clips_per_sec_chip = clips_per_step / per_step / n_chips
    result = {
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips_per_sec_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_chip / REFERENCE_CLIPS_PER_SEC,
                             3),
        # spread across the timing reps (value is the median rep)
        "value_min": round(clips_per_step / max(per_steps) / n_chips, 2),
        "value_max": round(clips_per_step / min(per_steps) / n_chips, 2),
        "timing_reps": n_reps,
    }
    result.update(_perf_extras(jax, flops_step, per_step, n_chips))
    stage(f"per_step={per_step * 1e3:.2f}ms  loss={loss:.4f}  "
          f"mfu={result.get('mfu')}")
    return result


# ---------------------------------------------------------------------------
# driver-proof orchestration
# ---------------------------------------------------------------------------

_RUNNERS = {"retrieval": run_retrieval, "caption": run_caption,
            "decode": run_decode}


def _error_result(mode: str, error: str, at_stage: str,
                  attempts: int) -> dict:
    metric, unit = _MODE_UNITS.get(mode, _MODE_UNITS["retrieval"])
    return {"metric": metric, "value": None, "unit": unit,
            "vs_baseline": None, "error": error, "stage": at_stage,
            "attempts": attempts}


def _worker(mode: str) -> int:
    """Run one benchmark attempt; print exactly one JSON line to stdout."""
    def on_term(_sig, _frm):
        print(json.dumps(_error_result(
            mode, "worker terminated by watchdog (deadline)",
            _LAST_STAGE, 1)), flush=True)
        os._exit(3)

    signal.signal(signal.SIGTERM, on_term)
    try:
        result = _RUNNERS[mode]()
    except BaseException as exc:  # noqa: BLE001 - must always emit JSON
        err = f"{type(exc).__name__}: {exc}"
        print(json.dumps(_error_result(mode, err[:2000], _LAST_STAGE, 1)),
              flush=True)
        return 1
    print(json.dumps(result), flush=True)
    return 0


def _parse_result(out: str):
    for line in reversed((out or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _retriable(error: str) -> bool:
    low = (error or "").lower()
    return any(tok in low for tok in (
        "unavailable", "backend", "initialize", "deadline_exceeded",
        "failed_precondition", "connection"))


COMPETITOR_PIDFILE = Path(__file__).resolve().parent / ".bench_competitors.pid"


def _pause_competitors() -> list:
    """SIGSTOP registered host-CPU-heavy processes for the bench run.

    This host has ONE cpu core. The reference-scale quality A/B
    (tools/ab_reference_retrieval.py) runs torch on it for hours and
    starves JAX's host-side tracing/compile — measured: the bench's
    model/step build went 9.7s -> 196.6s and compile+warmup blew the
    whole 390s budget while the torch run was live. Long A/B tools
    register "pid tag" lines in .bench_competitors.pid; a PID is only
    touched if it is alive AND its /proc cmdline still contains the
    recorded tag (no pattern matching against other processes). Every
    stopped PID is SIGCONTed in _parent's finally, so the A/B run loses
    only the bench's wall-clock, never progress.
    """
    paused = []
    try:
        lines = COMPETITOR_PIDFILE.read_text().splitlines()
    except OSError:
        return paused
    for line in lines:
        parts = line.split(None, 1)
        if len(parts) != 2 or not parts[0].isdigit():
            continue
        pid, tag = int(parts[0]), parts[1].strip()
        try:
            cmdline = Path(f"/proc/{pid}/cmdline").read_bytes()
        except OSError:
            continue  # not alive
        if tag.encode() not in cmdline:
            continue  # pid was recycled; leave it alone
        try:
            os.kill(pid, signal.SIGSTOP)
            paused.append(pid)
            stage(f"paused competitor pid {pid} ({tag}) for the bench")
        except OSError:
            pass
    return paused


def _resume_competitors(paused: list) -> None:
    for pid in paused:
        try:
            os.kill(pid, signal.SIGCONT)
            stage(f"resumed competitor pid {pid}")
        except OSError:
            pass


def _parent(mode: str) -> int:
    """Watchdog wrapper: ALWAYS prints one JSON line within the deadline.

    The actual bench runs in a worker subprocess because a wedged TPU
    tunnel hangs `import jax` itself — an in-process watchdog could never
    preempt that. Transient backend-init failures (the BENCH_r02 mode:
    UNAVAILABLE raised within seconds) are retried with backoff in a
    fresh process; a hang (the tunnel-wedge mode) burns the whole budget
    once and is reported, since retrying into a wedged tunnel cannot help.
    """
    paused = _pause_competitors()
    try:
        return _parent_inner(mode)
    finally:
        _resume_competitors(paused)


def _run_worker_once(mode: str, budget: float, attempt: int):
    """One worker subprocess bounded by `budget` seconds.

    Returns (parsed_json_or_None, last_err, last_stage, timed_out).
    """
    stage_file = Path(f"/tmp/bench_stage_{os.getpid()}_{mode}_{attempt}")
    env = dict(os.environ, BENCH_STAGE_FILE=str(stage_file))
    proc = subprocess.Popen(
        [sys.executable, "-u", __file__, "--worker", mode],
        stdout=subprocess.PIPE, stderr=None, text=True, env=env)
    timed_out = False
    try:
        out, _ = proc.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        timed_out = True
        stage(f"{mode} worker exceeded its budget; terminating it")
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=8)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
    file_stage = None
    if stage_file.exists():
        file_stage = stage_file.read_text().strip() or None
        stage_file.unlink(missing_ok=True)
    parsed = _parse_result(out)
    if proc.returncode == 0 and parsed and parsed.get("value") is not None:
        return parsed, None, None, False
    err = (parsed or {}).get(
        "error", f"worker exited rc={proc.returncode} with no JSON")
    at_stage = (parsed or {}).get("stage") or file_stage or "unknown"
    return None, err, at_stage, timed_out


def _parent_inner(mode: str) -> int:
    deadline = float(os.environ.get("BENCH_DEADLINE", "390"))
    attempts_max = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    reserve = 10.0  # seconds kept for our own teardown + emission
    t_start = time.monotonic()
    last_err, last_stage = "never attempted", "startup"
    attempt = 0
    result = None

    for attempt in range(1, attempts_max + 1):
        remaining = deadline - (time.monotonic() - t_start) - reserve
        if remaining < 30:
            last_err += " (no budget left for another attempt)"
            break
        stage(f"attempt {attempt}/{attempts_max}: launching {mode} worker "
              f"(budget {remaining:.0f}s)")
        parsed, err, at_stage, timed_out = _run_worker_once(
            mode, remaining, attempt)
        if parsed is not None:
            parsed["attempts"] = attempt
            result = parsed
            break
        last_err, last_stage = err, at_stage
        if timed_out:
            last_err = (f"bench deadline ({deadline:.0f}s) hit at stage "
                        f"'{last_stage}': {last_err}")
            stage(last_err)
            break  # a hang means a wedged tunnel; retries cannot help
        stage(f"attempt {attempt} failed at '{last_stage}': "
              f"{last_err[:300]}")
        if not _retriable(last_err):
            break
        backoff = min(15.0 * (2 ** (attempt - 1)),
                      deadline - (time.monotonic() - t_start) - reserve - 30)
        if backoff > 0 and attempt < attempts_max:
            stage(f"backing off {backoff:.0f}s before retry")
            time.sleep(backoff)

    if result is None:
        print(json.dumps(_error_result(
            mode, last_err[:2000], last_stage, attempt)), flush=True)
        return 1

    # Secondary workloads in the leftover budget: the driver runs only
    # the default (retrieval) mode, so the caption train-step number
    # (VERDICT r3 #4) and the free-running decode number (VERDICT r4 #4)
    # ride the same JSON line as caption_* / decode_* fields. Warm
    # .jax_cache makes each ~40-100s; each is independently skipped
    # (with the reason recorded) when the budget runs out.
    secondaries = [s for s in os.environ.get(
        "BENCH_SECONDARY",
        "caption,decode" if mode == "retrieval" else "").split(",") if s]
    for secondary in secondaries:
        remaining = deadline - (time.monotonic() - t_start) - reserve
        if remaining < 100:
            result[f"{secondary}_skipped"] = (
                f"only {remaining:.0f}s of budget left")
            stage(f"skipping secondary '{secondary}': {remaining:.0f}s left")
            continue
        stage(f"launching secondary '{secondary}' worker "
              f"(budget {remaining:.0f}s)")
        parsed2, err2, at_stage2, _ = _run_worker_once(
            secondary, remaining, 1)
        if parsed2 is not None and parsed2.get("value") is not None:
            # defensive merge: a schema-light secondary result must
            # degrade to partial fields, never crash the parent after
            # the primary already succeeded
            prefix = secondary
            metric = parsed2.get(
                "metric", _MODE_UNITS.get(secondary, (secondary,))[0])
            result[metric] = parsed2["value"]
            result[f"{prefix}_unit"] = parsed2.get("unit")
            result[f"{prefix}_vs_baseline"] = parsed2.get("vs_baseline")
            for k in ("per_step_ms", "per_call_ms", "mfu",
                      "model_flops_per_step",
                      "model_flops_per_sec_per_chip",
                      "value_min", "value_max", "timing_reps"):
                if k in parsed2:
                    result[f"{prefix}_{k}"] = parsed2[k]
        else:
            err2 = err2 or "worker returned no value"
            result[f"{secondary}_error"] = \
                f"{err2[:300]} (at {at_stage2})"
            stage(f"secondary '{secondary}' failed: {err2[:200]}")

    print(json.dumps(result), flush=True)
    return 0


def _warm() -> int:
    """`python bench.py warm`: compile every bench workload's exact
    program into the persistent .jax_cache (no timing, no deadline
    pressure, no competitor pausing). Run this after any change to the
    step functions or bench shapes so the driver's budgeted run always
    hits a warm cache (round-4 lesson: one cold caption compile ate 234s
    of a 338s leftover budget)."""
    rc = 0
    for m in ("retrieval", "caption", "decode"):
        stage(f"warming '{m}' program cache")
        t0 = time.monotonic()
        parsed, err, at_stage, _ = _run_worker_once(m, 1200.0, 1)
        dt = time.monotonic() - t0
        if parsed is not None:
            stage(f"'{m}' warm in {dt:.0f}s "
                  f"(value={parsed.get('value')})")
        else:
            stage(f"'{m}' warm FAILED in {dt:.0f}s at {at_stage}: "
                  f"{(err or '')[:200]}")
            rc = 1
    print(json.dumps({"warmed": rc == 0}), flush=True)
    return rc


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    worker = "--worker" in argv
    if worker:
        argv.remove("--worker")
    mode = os.environ.get("BENCH_MODE", "retrieval")
    if argv:
        mode = argv[0]
    if mode == "warm":
        return _warm()
    if mode not in _RUNNERS:
        print(json.dumps(_error_result(
            mode, f"unknown bench mode '{mode}'", "startup", 0)),
            flush=True)
        return 2
    if worker:
        return _worker(mode)
    return _parent(mode)


if __name__ == "__main__":
    sys.exit(main())
