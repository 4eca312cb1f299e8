"""Convert a reference PyTorch Daft-Exprt checkpoint to this framework.

The released checkpoint (reference train.py:73-78) is a torch ``.pt``
dict {iteration, learning_rate, best_val_loss, state_dict, optimizer,
config_params}. This tool maps the state_dict onto our params pytree:

- linear weights transpose (out, in) -> (in, out);
- conv1d weights transpose (out, in, k) -> (k, in, out);
- ``nn.MultiheadAttention`` packed ``in_proj_weight`` (3E, E) unpacks
  into separate q/k/v projections (each transposed);
- DDP ``module.`` prefixes are stripped.

Output: a .npz of flattened params ('/'-joined paths) + a config.json,
loadable with ``load_converted_checkpoint``.

Usage:
    python tools/convert_checkpoint.py <torch_ckpt.pt> <out_dir>
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def _t(arr):
    return np.ascontiguousarray(np.asarray(arr, np.float32).T)


def _conv(arr):  # (out, in, k) -> (k, in, out)
    return np.ascontiguousarray(
        np.asarray(arr, np.float32).transpose(2, 1, 0))


def _linear(sd, prefix):
    return {"w": _t(sd[f"{prefix}.weight"]),
            "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _conv1d(sd, prefix):
    return {"w": _conv(sd[f"{prefix}.conv.weight"]),
            "b": np.asarray(sd[f"{prefix}.conv.bias"], np.float32)}


def _layer_norm(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _mha(sd, prefix):
    w = np.asarray(sd[f"{prefix}.multi_head_attention.in_proj_weight"],
                   np.float32)
    b = np.asarray(sd[f"{prefix}.multi_head_attention.in_proj_bias"],
                   np.float32)
    e = w.shape[1]
    qw, kw, vw = w[:e], w[e:2 * e], w[2 * e:]
    qb, kb, vb = b[:e], b[e:2 * e], b[2 * e:]
    return {
        "q_w": _t(qw), "k_w": _t(kw), "v_w": _t(vw),
        "q_b": qb, "k_b": kb, "v_b": vb,
        "out_w": _t(sd[f"{prefix}.multi_head_attention.out_proj.weight"]),
        "out_b": np.asarray(
            sd[f"{prefix}.multi_head_attention.out_proj.bias"], np.float32),
        "ln": _layer_norm(sd, f"{prefix}.layer_norm"),
    }


def _fft_block(sd, prefix):
    return {
        "attn": _mha(sd, f"{prefix}.attention"),
        "ff": {
            "conv1": _conv1d(sd, f"{prefix}.feed_forward.convs.0"),
            "conv2": _conv1d(sd, f"{prefix}.feed_forward.convs.2"),
            "ln": _layer_norm(sd, f"{prefix}.feed_forward.layer_norm"),
        },
    }


def _blocks(sd, prefix, n):
    return [_fft_block(sd, f"{prefix}.blocks.{i}") for i in range(n)]


def convert_state_dict(sd: dict, hparams) -> dict:
    """torch state_dict (module.-stripped) -> our params pytree."""
    pe_blocks = hparams.prosody_encoder["nb_blocks"]
    ph_blocks = hparams.phoneme_encoder["nb_blocks"]
    pp_blocks = hparams.local_prosody_predictor["nb_blocks"]
    fd_blocks = hparams.frame_decoder["nb_blocks"]

    prosody_encoder = {
        "energy_embedding": _conv1d(sd, "prosody_encoder.energy_embedding"),
        "pitch_embedding": _conv1d(sd, "prosody_encoder.pitch_embedding"),
        "prenet": {
            "conv1": _conv1d(sd, "prosody_encoder.convs.0"),
            "ln1": _layer_norm(sd, "prosody_encoder.convs.2"),
            "conv2": _conv1d(sd, "prosody_encoder.convs.4"),
            "ln2": _layer_norm(sd, "prosody_encoder.convs.6"),
            "conv3": _conv1d(sd, "prosody_encoder.convs.8"),
            "ln3": _layer_norm(sd, "prosody_encoder.convs.10"),
        },
        "blocks": _blocks(sd, "prosody_encoder", pe_blocks),
        "spk_embedding": {
            "table": np.asarray(sd["prosody_encoder.spk_embedding.weight"],
                                np.float32)},
        "gammas_predictor": _linear(
            sd, "prosody_encoder.gammas_predictor.linear_layer"),
        "betas_predictor": _linear(
            sd, "prosody_encoder.betas_predictor.linear_layer"),
    }
    if "prosody_encoder.post_multipliers" in sd:
        prosody_encoder["post_multipliers"] = np.asarray(
            sd["prosody_encoder.post_multipliers"], np.float32)

    speaker_classifier = {
        "fc1": _linear(sd, "speaker_classifier.classifier.1.linear_layer"),
        "fc2": _linear(sd, "speaker_classifier.classifier.3.linear_layer"),
        "fc3": _linear(sd, "speaker_classifier.classifier.5.linear_layer"),
    }
    phoneme_encoder = {
        "symbols_embedding": {
            "table": np.asarray(
                sd["phoneme_encoder.symbols_embedding.weight"], np.float32)},
        "blocks": _blocks(sd, "phoneme_encoder", ph_blocks),
    }
    prosody_predictor = {
        "blocks": [{
            "conv1": _conv1d(sd, f"prosody_predictor.blocks.{i}.0"),
            "ln1": _layer_norm(sd, f"prosody_predictor.blocks.{i}.2"),
            "conv2": _conv1d(sd, f"prosody_predictor.blocks.{i}.4"),
            "ln2": _layer_norm(sd, f"prosody_predictor.blocks.{i}.6"),
        } for i in range(pp_blocks)],
        "projection": _linear(sd, "prosody_predictor.projection.linear_layer"),
    }
    gaussian_upsampling = {
        "duration_projection": _conv1d(
            sd, "gaussian_upsampling.duration_projection"),
        "energy_projection": _conv1d(
            sd, "gaussian_upsampling.energy_projection"),
        "pitch_projection": _conv1d(
            sd, "gaussian_upsampling.pitch_projection"),
        "range_predictor": _linear(
            sd, "gaussian_upsampling.projection.0.linear_layer"),
    }
    frame_decoder = {
        "blocks": _blocks(sd, "frame_decoder", fd_blocks),
        "projection": _linear(sd, "frame_decoder.projection.linear_layer"),
    }
    return {
        "prosody_encoder": prosody_encoder,
        "speaker_classifier": speaker_classifier,
        "phoneme_encoder": phoneme_encoder,
        "prosody_predictor": prosody_predictor,
        "gaussian_upsampling": gaussian_upsampling,
        "frame_decoder": frame_decoder,
    }


# ----------------------------------------------------------------------
# Reverse direction: our pytree -> reference torch state_dict
# ----------------------------------------------------------------------
def export_state_dict(params: dict) -> dict:
    """Our params pytree -> reference-format state_dict (numpy arrays).

    Exact inverse of :func:`convert_state_dict` (same key map as the
    reference model.py modules), so acoustic models trained in this
    framework load into the reference PyTorch implementation with
    ``load_state_dict(strict=True)``.
    """
    sd: dict = {}

    def put_linear(prefix, p):
        sd[f"{prefix}.weight"] = _t(p["w"])
        sd[f"{prefix}.bias"] = np.asarray(p["b"], np.float32)

    def put_conv1d(prefix, p):  # (k, in, out) -> (out, in, k)
        sd[f"{prefix}.conv.weight"] = np.ascontiguousarray(
            np.asarray(p["w"], np.float32).transpose(2, 1, 0))
        sd[f"{prefix}.conv.bias"] = np.asarray(p["b"], np.float32)

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)

    def put_mha(prefix, p):
        sd[f"{prefix}.multi_head_attention.in_proj_weight"] = \
            np.concatenate([_t(p["q_w"]), _t(p["k_w"]), _t(p["v_w"])], 0)
        sd[f"{prefix}.multi_head_attention.in_proj_bias"] = \
            np.concatenate([np.asarray(p[k], np.float32)
                            for k in ("q_b", "k_b", "v_b")])
        sd[f"{prefix}.multi_head_attention.out_proj.weight"] = \
            _t(p["out_w"])
        sd[f"{prefix}.multi_head_attention.out_proj.bias"] = \
            np.asarray(p["out_b"], np.float32)
        put_ln(f"{prefix}.layer_norm", p["ln"])

    def put_block(prefix, p):
        put_mha(f"{prefix}.attention", p["attn"])
        put_conv1d(f"{prefix}.feed_forward.convs.0", p["ff"]["conv1"])
        put_conv1d(f"{prefix}.feed_forward.convs.2", p["ff"]["conv2"])
        put_ln(f"{prefix}.feed_forward.layer_norm", p["ff"]["ln"])

    pe = params["prosody_encoder"]
    put_conv1d("prosody_encoder.energy_embedding", pe["energy_embedding"])
    put_conv1d("prosody_encoder.pitch_embedding", pe["pitch_embedding"])
    pre = pe["prenet"]
    for i, (conv, ln) in enumerate((("conv1", "ln1"), ("conv2", "ln2"),
                                    ("conv3", "ln3"))):
        put_conv1d(f"prosody_encoder.convs.{4 * i}", pre[conv])
        put_ln(f"prosody_encoder.convs.{4 * i + 2}", pre[ln])
    for i, block in enumerate(pe["blocks"]):
        put_block(f"prosody_encoder.blocks.{i}", block)
    sd["prosody_encoder.spk_embedding.weight"] = np.asarray(
        pe["spk_embedding"]["table"], np.float32)
    put_linear("prosody_encoder.gammas_predictor.linear_layer",
               pe["gammas_predictor"])
    put_linear("prosody_encoder.betas_predictor.linear_layer",
               pe["betas_predictor"])
    if "post_multipliers" in pe:
        sd["prosody_encoder.post_multipliers"] = np.asarray(
            pe["post_multipliers"], np.float32)

    sc = params["speaker_classifier"]
    put_linear("speaker_classifier.classifier.1.linear_layer", sc["fc1"])
    put_linear("speaker_classifier.classifier.3.linear_layer", sc["fc2"])
    put_linear("speaker_classifier.classifier.5.linear_layer", sc["fc3"])

    ph = params["phoneme_encoder"]
    sd["phoneme_encoder.symbols_embedding.weight"] = np.asarray(
        ph["symbols_embedding"]["table"], np.float32)
    for i, block in enumerate(ph["blocks"]):
        put_block(f"phoneme_encoder.blocks.{i}", block)

    pp = params["prosody_predictor"]
    for i, block in enumerate(pp["blocks"]):
        put_conv1d(f"prosody_predictor.blocks.{i}.0", block["conv1"])
        put_ln(f"prosody_predictor.blocks.{i}.2", block["ln1"])
        put_conv1d(f"prosody_predictor.blocks.{i}.4", block["conv2"])
        put_ln(f"prosody_predictor.blocks.{i}.6", block["ln2"])
    put_linear("prosody_predictor.projection.linear_layer",
               pp["projection"])

    gu = params["gaussian_upsampling"]
    put_conv1d("gaussian_upsampling.duration_projection",
               gu["duration_projection"])
    put_conv1d("gaussian_upsampling.energy_projection",
               gu["energy_projection"])
    put_conv1d("gaussian_upsampling.pitch_projection",
               gu["pitch_projection"])
    put_linear("gaussian_upsampling.projection.0.linear_layer",
               gu["range_predictor"])

    fd = params["frame_decoder"]
    for i, block in enumerate(fd["blocks"]):
        put_block(f"frame_decoder.blocks.{i}", block)
    put_linear("frame_decoder.projection.linear_layer", fd["projection"])
    return sd


# ----------------------------------------------------------------------
# Flattened npz round-trip
# ----------------------------------------------------------------------
def flatten_params(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_params(flat: dict):
    tree: dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_converted_checkpoint(out_dir: str, params, config: dict,
                              meta: dict | None = None):
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "params.npz"), **flatten_params(params))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=4, sort_keys=True, default=float)
    if meta:
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)


def load_converted_checkpoint(ckpt_dir: str):
    """-> (params pytree, config dict)."""
    flat = dict(np.load(os.path.join(ckpt_dir, "params.npz")))
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        config = json.load(f)
    return unflatten_params(flat), config


def main():
    import torch
    torch_ckpt, out_dir = sys.argv[1], sys.argv[2]
    ckpt = torch.load(torch_ckpt, map_location="cpu")
    sd = {k.replace("module.", ""): v.numpy()
          for k, v in ckpt["state_dict"].items()}
    config = ckpt["config_params"]

    from daft_exprt_tpu.config import HyperParams
    hp = HyperParams(verbose=False, **{
        k: v for k, v in config.items()
        if k in HyperParams(
            verbose=False, training_files="x", validation_files="x",
            output_directory="/tmp", language="english",
            speakers=["a"]).__dict__})
    params = convert_state_dict(sd, hp)
    meta = {"iteration": ckpt.get("iteration"),
            "learning_rate": ckpt.get("learning_rate"),
            "best_val_loss": ckpt.get("best_val_loss")}
    save_converted_checkpoint(out_dir, params, config, meta)
    n = sum(int(np.prod(v.shape)) for v in flatten_params(params).values())
    print(f"converted {n} params -> {out_dir}")


if __name__ == "__main__":
    main()
