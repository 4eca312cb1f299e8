"""Shared test utilities: tiny configs and synthetic batches."""

import numpy as np

from daft_exprt_tpu.config import HyperParams


def tiny_hparams(**overrides):
    """A small-but-structurally-faithful model config for fast tests."""
    kwargs = dict(
        verbose=False,
        training_files="x", validation_files="x",
        output_directory="/tmp/dx_test",
        language="english",
        speakers=["spk_a", "spk_b", "spk_c"],
        compute_dtype="float32",
        prosody_encoder={
            "nb_blocks": 2, "hidden_embed_dim": 16, "attn_nb_heads": 4,
            "attn_dropout": 0.1, "conv_kernel": 3, "conv_channels": 24,
            "conv_dropout": 0.1,
        },
        phoneme_encoder={
            "nb_blocks": 2, "hidden_embed_dim": 16, "attn_nb_heads": 2,
            "attn_dropout": 0.1, "conv_kernel": 3, "conv_channels": 24,
            "conv_dropout": 0.1,
        },
        local_prosody_predictor={
            "nb_blocks": 1, "conv_kernel": 3, "conv_channels": 12,
            "conv_dropout": 0.1,
        },
        gaussian_upsampling_module={"conv_kernel": 3},
        frame_decoder={
            "nb_blocks": 2, "attn_nb_heads": 2, "attn_dropout": 0.1,
            "conv_kernel": 3, "conv_channels": 24, "conv_dropout": 0.1,
        },
    )
    kwargs.update(overrides)
    return HyperParams(**kwargs)


def pinned_init_params(model, seed=0, seconds_per_phone=0.12):
    """Random-init params with the duration head pinned to a realistic
    per-phone duration.

    Random-init duration predictions hover near zero seconds, which
    quantize to 0-2 total frames and make Griffin-Lim previews (which
    drop the two centered-STFT tail frames, as the reference does,
    /root/reference/src/daft_exprt/generate.py:429-433) legitimately
    empty. Real checkpoints predict tens of frames per sentence; test
    checkpoints should too. Shared by every e2e test that fabricates a
    checkpoint (CLI, style bank, serving).
    """
    import jax

    params = model.init_params(jax.random.PRNGKey(seed))
    proj = params["prosody_predictor"]["projection"]
    proj["w"] = proj["w"].at[:, 0].set(0.0)
    proj["b"] = proj["b"].at[0].set(seconds_per_phone)
    return params


def synthetic_batch(hp, batch_size=4, max_symbols=12, max_frames=48,
                    seed=0):
    """Random but invariant-respecting training batch.

    sum(durations_int) == output_length <= max_frames per row; padded
    entries are zero.
    """
    rng = np.random.default_rng(seed)
    B, L, T = batch_size, max_symbols, max_frames

    input_lengths = rng.integers(L // 2, L + 1, size=B)
    symbols = np.zeros((B, L), np.int32)
    durations_int = np.zeros((B, L), np.int32)
    durations_float = np.zeros((B, L), np.float32)
    symbols_energy = np.zeros((B, L), np.float32)
    symbols_pitch = np.zeros((B, L), np.float32)
    output_lengths = np.zeros((B,), np.int32)

    frame_dur = hp.hop_length / hp.sampling_rate
    for b in range(B):
        n = input_lengths[b]
        symbols[b, :n] = rng.integers(1, hp.n_symbols, size=n)
        # random frame counts per symbol, total <= T
        budget = rng.integers(T // 2, T + 1)
        cuts = np.sort(rng.choice(np.arange(1, budget), size=n - 1,
                                  replace=False))
        durs = np.diff(np.concatenate([[0], cuts, [budget]]))
        durations_int[b, :n] = durs
        durations_float[b, :n] = durs * frame_dur
        symbols_energy[b, :n] = rng.standard_normal(n)
        symbols_pitch[b, :n] = rng.standard_normal(n)
        output_lengths[b] = durs.sum()

    T_used = T
    frames_energy = np.zeros((B, T_used), np.float32)
    frames_pitch = np.zeros((B, T_used), np.float32)
    mel_specs = np.zeros((B, hp.n_mel_channels, T_used), np.float32)
    for b in range(B):
        t = output_lengths[b]
        frames_energy[b, :t] = np.abs(rng.standard_normal(t)) + 1.0
        frames_pitch[b, :t] = rng.standard_normal(t)
        mel_specs[b, :, :t] = rng.standard_normal((hp.n_mel_channels, t))

    speaker_ids = rng.integers(0, len(hp.speakers), size=B).astype(np.int32)
    return {
        "symbols": symbols,
        "durations_float": durations_float,
        "durations_int": durations_int,
        "symbols_energy": symbols_energy,
        "symbols_pitch": symbols_pitch,
        "input_lengths": input_lengths.astype(np.int32),
        "frames_energy": frames_energy,
        "frames_pitch": frames_pitch,
        "mel_specs": mel_specs,
        "output_lengths": output_lengths,
        "speaker_ids": speaker_ids,
    }
