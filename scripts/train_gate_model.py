"""Train a small gpt2-family model on synthetic structured text for the
quantization quality gate (VERDICT r3 #2/#3).

WHY: the ΔPPL gate (BASELINE: "ΔPPL ≤ 0.1 at the same bit-width") presumes a
TRAINED model. At a trained minimum the loss is locally flat, so weight-
rounding damage is second-order (½ δWᵀHδW); a random-init model sits on a
slope, making the damage first-order in ‖δW‖ — measured in ppl_report.py,
NO rounding scheme reaches the gate there (int4 RTN/AWQ/clip all land at
2.5–5.6e-2 nats, 5–10× over). This environment has no network egress (no HF
checkpoints), so we mint realistic weights the only honest way: training.

Corpus: deterministic synthetic mix with real structure —
  * order-1 Markov chain over a Zipfian vocab (sparse 8-successor rows),
  * copy/induction segments (a random span repeated later in the window),
so the trained model develops anisotropic weights, attention structure, and
low in-domain PPL (the regime AWQ/GPTQ-style methods are built for).

Saves params (npz) + the config + a held-out eval stream to
data/gate_model.npz; `scripts/ppl_report.py` picks it up automatically.

Runs on TPU (fast) or CPU (~20-40 min). Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_gate_model.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vllmini_tpu.config import ModelConfig  # noqa: E402

# Three scales (GATE_SIZE={small,mid,large}) so the PTQ dPPL trend vs
# model scale is measurable (VERDICT r3 #5): per-parameter redundancy grows
# with scale, so int4 PTQ damage should shrink toward the 0.1 gate as the
# model grows — that trend is the honest stand-in for an unfetchable 8B
# checkpoint (no network egress here).
SIZES = {
    "small": dict(vocab_size=2048, hidden_size=256, num_layers=6,
                  num_heads=8, intermediate_size=1024),   # ~ 5M params
    "mid": dict(vocab_size=2048, hidden_size=384, num_layers=8,
                num_heads=8, intermediate_size=1536),     # ~15M params
    "large": dict(vocab_size=4096, hidden_size=512, num_layers=12,
                  num_heads=8, intermediate_size=2048),   # ~40M params
}
SIZE = os.environ.get("GATE_SIZE", "small")
CONFIG = ModelConfig(family="gpt2", max_position_embeddings=256,
                     dtype="float32", **SIZES[SIZE])
SEQ = 256
BATCH = int(os.environ.get("GATE_TRAIN_BATCH", "16"))
STEPS = int(os.environ.get("GATE_TRAIN_STEPS", "700"))
LR = 3e-4
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data",
    f"gate_model{'' if SIZE == 'small' else '_' + SIZE}.npz")


# ------------------------------------------------------------------ corpus

def make_markov(rng, vocab, succ=8):
    """Sparse Zipfian order-1 chain: token t -> one of succ[t] successors."""
    successors = rng.integers(0, vocab, size=(vocab, succ))
    probs = rng.dirichlet(np.ones(succ) * 0.5, size=vocab)
    return successors, probs


def sample_window(rng, successors, probs, length):
    vocab, succ = successors.shape
    out = np.empty(length, np.int64)
    t = rng.integers(0, vocab)
    for i in range(length):
        out[i] = t
        t = successors[t, rng.choice(succ, p=probs[t])]
    # Induction structure: repeat a random span later in the window.
    if length >= 64:
        span = rng.integers(8, 24)
        src = rng.integers(0, length // 2 - span)
        dst = rng.integers(length // 2, length - span)
        out[dst: dst + span] = out[src: src + span]
    return out


CHAIN_SEED = 1  # the corpus IS this chain; train/eval differ by sample seed


def make_batches(sample_seed, n_tokens):
    chain_rng = np.random.default_rng(CHAIN_SEED)
    successors, probs = make_markov(chain_rng, CONFIG.vocab_size)
    rng = np.random.default_rng(sample_seed)
    stream = np.concatenate([
        sample_window(rng, successors, probs, SEQ)
        for _ in range(-(-n_tokens // SEQ))])
    return stream[:n_tokens].astype(np.int32)


# ---------------------------------------------------------------- forward
# Dense causal forward replicating models/gpt2.prefill_forward semantics
# (LN placement, approximate gelu, tied head); parity is asserted after
# training against the family scorer.

def forward(params, tokens):  # tokens [B, T] -> logits [B, T, V]
    cfg = CONFIG
    B, T = tokens.shape
    H, d = cfg.num_heads, cfg.head_size
    x = params["wte"][tokens] + params["wpe"][jnp.arange(T)][None]

    def ln(x, p):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps) \
            * p["g"] + p["b"]

    mask = jnp.tril(jnp.ones((T, T), bool))
    for blk in params["blocks"]:
        h1 = ln(x, blk["ln_1"])
        qkv = h1 @ blk["attn"]["c_attn_w"] + blk["attn"]["c_attn_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(d))
        s = jnp.where(mask[None, None], s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3)
        o = o.reshape(B, T, H * d)
        x = x + o @ blk["attn"]["c_proj_w"] + blk["attn"]["c_proj_b"]
        h2 = ln(x, blk["ln_2"])
        m = jax.nn.gelu(h2 @ blk["mlp"]["c_fc_w"] + blk["mlp"]["c_fc_b"],
                        approximate=True)
        x = x + m @ blk["mlp"]["c_proj_w"] + blk["mlp"]["c_proj_b"]
    x = ln(x, params["ln_f"])
    return x @ params["wte"].T


def loss_fn(params, tokens):
    logits = forward(params, tokens)
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)
    return jnp.mean(nll)


# --------------------------------------------------------- QAT finetune

def fake_quant_int4(w, G=128):
    """Straight-through int4-g128 fake quantization (LLM-QAT-style): the
    forward sees the dequantized grid, the gradient flows to the raw
    weight. Scale matches the serving quantizer's symmetric per-group
    amax (ops/quant_matmul.quantize_weight with clip off)."""
    K, N = w.shape
    wf = w.reshape(K // G, G, N)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 7.0,
                    1e-10)
    s = jax.lax.stop_gradient(s)
    q = jnp.clip(jnp.round(wf / s), -7.0, 7.0)
    wq = (q * s).reshape(K, N)
    return w + jax.lax.stop_gradient(wq - w)


def qat_view(params):
    """Fake-quantize exactly the weights the serving int4 path quantizes
    (2-D block mats, min dim >= 64, K % 128 == 0); embeddings/head stay
    full precision (served at int8, whose damage is negligible)."""
    def maybe(x):
        if x.ndim == 2 and min(x.shape) >= 64 and x.shape[0] % 128 == 0:
            return fake_quant_int4(x)
        return x

    return {**params,
            "blocks": [jax.tree.map(maybe, b) for b in params["blocks"]]}


# ------------------------------------------------------------------- train

def save_params(params, eval_stream, path):
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    flat["__eval_stream__"] = np.asarray(eval_stream, np.int32)
    flat["__dims__"] = np.asarray([CONFIG.vocab_size, CONFIG.hidden_size,
                                   CONFIG.num_layers, CONFIG.num_heads,
                                   CONFIG.mlp_size], np.int32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params(path):
    """Rebuild (params, config, eval_stream) from the npz. The config is
    reconstructed from the stored dims (older checkpoints without them are
    the original small config)."""
    z = np.load(path)
    if "__dims__" in z.files:
        v, h, L, nh, inter = (int(x) for x in z["__dims__"])
        cfg = ModelConfig(family="gpt2", vocab_size=v, hidden_size=h,
                          num_layers=L, num_heads=nh,
                          intermediate_size=inter,
                          max_position_embeddings=256, dtype="float32")
    else:
        cfg = ModelConfig(family="gpt2", vocab_size=2048, hidden_size=256,
                          num_layers=6, num_heads=8,
                          intermediate_size=1024,
                          max_position_embeddings=256, dtype="float32")
    params = {"blocks": []}
    n_blocks = 1 + max(int(k.split(".")[1].split("/")[0])
                       for k in z.files if k.startswith("blocks."))
    params["blocks"] = [{} for _ in range(n_blocks)]

    def put(d, keys, v):
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = jnp.asarray(v)

    for name in z.files:
        if name == "__eval_stream__":
            continue
        if name.startswith("blocks."):
            rest = name[len("blocks."):]
            idx, path_ = rest.split("/", 1)
            put(params["blocks"][int(idx)], path_.split("/"), z[name])
        else:
            put(params, name.split("/"), z[name])
    return params, cfg, z["__eval_stream__"]


def main():
    import optax

    from vllmini_tpu.models.registry import get_family

    family = get_family(CONFIG)
    qat = os.environ.get("GATE_TRAIN_QAT") == "1"
    resume = (os.environ.get("GATE_TRAIN_RESUME") == "1" or qat) \
        and os.path.exists(OUT)
    if resume:
        params, _, _ = load_params(OUT)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        # QAT: shorter, gentler — polish the minimum into the int4 grid.
        lr = LR / 10 if qat else LR / 3
        sample_seed = 13 if qat else 11  # fresh tokens, same chain
        print(f"{'QAT-finetuning' if qat else 'resuming'} from {OUT} "
              f"({STEPS} more steps at lr {lr:g})")
    else:
        assert not qat, "GATE_TRAIN_QAT needs an existing checkpoint"
        params = family.init_params(CONFIG, jax.random.PRNGKey(0))
        params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
        lr, sample_seed = LR, 1

    train = make_batches(sample_seed, n_tokens=STEPS * BATCH * SEQ)
    eval_stream = make_batches(2, n_tokens=4096)

    opt = optax.adamw(optax.cosine_decay_schedule(lr, STEPS, 0.05),
                      weight_decay=0.01)
    state = opt.init(params)

    @jax.jit
    def step(params, state, tokens):
        def objective(p, t):
            return loss_fn(qat_view(p) if qat else p, t)
        loss, grads = jax.value_and_grad(objective)(params, tokens)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    t0 = time.time()
    for i in range(STEPS):
        beg = i * BATCH * SEQ
        tokens = jnp.asarray(
            train[beg: beg + BATCH * SEQ].reshape(BATCH, SEQ))
        params, state, loss = step(params, state, tokens)
        if i % 50 == 0 or i == STEPS - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}  ppl "
                  f"{float(jnp.exp(loss)):.2f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if i and i % 100 == 0:
            # Periodic checkpoint: a CPU run takes an hour+ under load; a
            # killed job must not lose everything (it did once).
            save_params(params, eval_stream, OUT)

    save_params(params, eval_stream, OUT)
    print(f"saved {OUT}")

    # Parity check: the training forward must match the family scorer (the
    # gate evaluates through the family path).
    from vllmini_tpu.evaluation.ppl import perplexity
    p2, cfg, ev = load_params(OUT)
    fam_ppl = perplexity(p2, cfg, ev[:SEQ], window=SEQ)
    my_lp = loss_fn(p2, jnp.asarray(ev[:SEQ])[None])
    print(f"family-scorer ppl {fam_ppl:.4f} vs train-forward ppl "
          f"{float(jnp.exp(my_lp)):.4f}")
    assert abs(np.log(fam_ppl) - float(my_lp)) < 0.02, \
        "training forward diverges from family scorer"
    print("parity OK")


if __name__ == "__main__":
    main()
