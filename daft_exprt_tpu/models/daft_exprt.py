"""Daft-Exprt acoustic model (pure-functional JAX).

Composition (parity with /root/reference/src/daft_exprt/model.py:713-923):

- ProsodyEncoder (model.py:295-464): reads a reference utterance
  (frame energy + frame log-F0 + mel) through conv embeddings, a 3-conv
  mel prenet and 4 FFT blocks (8 heads, no FiLM), mean-pools over time,
  adds a speaker embedding and predicts FiLM (gamma, beta) parameters for
  the three FiLM-ed modules in the "delta regime"
  (gamma = post * g + 1, beta = post * b) with L2-penalized scalar
  post-multipliers.
- SpeakerClassifier (model.py:267-292): gradient reversal + 3 linears,
  n_speakers - 1 output classes (reference head-sizing quirk kept).
- PhonemeEncoder (model.py:467-509): symbol embedding + positional
  encoding + 4 FiLM-ed FFT blocks (2 heads).
- LocalProsodyPredictor (model.py:512-575): conv block(s) + FiLM +
  linear -> (duration_sec, energy, pitch) per symbol.
- GaussianUpsamplingModule (model.py:578-662): prosody projections +
  range (std) predictor + Gaussian upsampling to frame rate.
- FrameDecoder (model.py:665-710): 4 FiLM-ed FFT blocks (2 heads) +
  linear -> 80-bin mel.

TPU-native design choices: static bucketed shapes everywhere (L, T are
padding buckets; masks carry true lengths), vectorized duration
quantization and pitch transforms (the reference loops on CPU per row:
model.py:789-812, :814-864), explicit dropout rngs, fp32 params with
bfloat16 matmul compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.models import modules as nn
from daft_exprt_tpu.ops.durations import durations_to_int_frames
from daft_exprt_tpu.ops.gaussian_upsampling import gaussian_upsample
from daft_exprt_tpu.ops.grad_reversal import gradient_reversal
from daft_exprt_tpu.ops.masking import mask_from_lengths
from daft_exprt_tpu.ops.positional import positional_encoding_table


class DaftExprt:
    """Holds static configuration; all methods are pure in params/inputs."""

    def __init__(self, hparams):
        self.hp = hparams
        self.dtype = jnp.bfloat16 if hparams.compute_dtype == "bfloat16" \
            else jnp.float32
        pe = hparams.prosody_encoder
        ph = hparams.phoneme_encoder
        pp = hparams.local_prosody_predictor
        fd = hparams.frame_decoder
        self.embed_dim = ph["hidden_embed_dim"]
        # FiLM layout: per-module (nb_blocks, channels); order matters for
        # slicing the flat gamma/beta projections.
        self.module_params = {
            "encoder": (ph["nb_blocks"], ph["hidden_embed_dim"]),
            "prosody_predictor": (pp["nb_blocks"], pp["conv_channels"]),
            "decoder": (fd["nb_blocks"], ph["hidden_embed_dim"]),
        }
        self.nb_tot_film_params = sum(b * c
                                      for b, c in self.module_params.values())
        self.nb_post_multipliers = sum(b
                                       for b, _ in self.module_params.values())
        self.pe_cfg, self.ph_cfg, self.pp_cfg, self.fd_cfg = pe, ph, pp, fd
        max_len = max(5000, hparams.max_frames + 1)
        # phoneme encoder + frame decoder run at embed_dim; the prosody
        # encoder has its own hidden dim (reference: each module owns a
        # PositionalEncoding, model.py:331/483/680) — a single table
        # would shape-error when the two dims differ
        self._pos_table = jnp.asarray(
            positional_encoding_table(self.embed_dim, max_len))
        pe_dim = pe["hidden_embed_dim"]
        self._pos_table_pe = self._pos_table if pe_dim == self.embed_dim \
            else jnp.asarray(positional_encoding_table(pe_dim, max_len))

    # ==================================================================
    # Parameter initialization
    # ==================================================================
    def init_params(self, rng):
        hp = self.hp
        # Host-side numpy sampling (nn.HostInitRNG): eager jax.random init
        # costs one tiny XLA compile per (op, shape) -- ~26 s of pure
        # compile time per process even at test scale.
        keys = nn.rng_split(nn.as_init_rng(rng), 8)
        E = self.embed_dim
        pe = self.pe_cfg

        # ---- prosody encoder ----
        # 5 prenet/embed keys + one per block + 4 head/embedding keys
        kk = nn.rng_split(keys[0], 9 + pe["nb_blocks"])
        pe_dim = pe["hidden_embed_dim"]
        prenet = {
            "conv1": nn.conv1d_init(kk[0], hp.n_mel_channels,
                                    pe["conv_channels"], pe["conv_kernel"],
                                    "relu"),
            "ln1": nn.layer_norm_init(pe["conv_channels"]),
            "conv2": nn.conv1d_init(kk[1], pe["conv_channels"],
                                    pe["conv_channels"], pe["conv_kernel"],
                                    "relu"),
            "ln2": nn.layer_norm_init(pe["conv_channels"]),
            "conv3": nn.conv1d_init(kk[2], pe["conv_channels"], pe_dim,
                                    pe["conv_kernel"], "relu"),
            "ln3": nn.layer_norm_init(pe_dim),
        }
        prosody_encoder = {
            "energy_embedding": nn.conv1d_init(kk[3], 1, pe_dim,
                                               pe["conv_kernel"]),
            "pitch_embedding": nn.conv1d_init(kk[4], 1, pe_dim,
                                              pe["conv_kernel"]),
            "prenet": prenet,
            "blocks": [
                nn.fft_block_init(kk[5 + i], pe_dim, pe["attn_nb_heads"],
                                  pe["conv_channels"], pe["conv_kernel"])
                for i in range(pe["nb_blocks"])
            ],
            "spk_embedding": nn.embedding_init(
                kk[5 + pe["nb_blocks"]], hp.n_speakers, pe_dim),
            "gammas_predictor": nn.linear_init(
                kk[6 + pe["nb_blocks"]], pe_dim, self.nb_tot_film_params),
            "betas_predictor": nn.linear_init(
                kk[7 + pe["nb_blocks"]], pe_dim, self.nb_tot_film_params),
        }
        if hp.post_mult_weight != 0.0:
            prosody_encoder["post_multipliers"] = nn.xavier_uniform(
                kk[8 + pe["nb_blocks"]], (2, self.nb_post_multipliers), 2,
                self.nb_post_multipliers)

        # ---- speaker classifier ----
        kk = nn.rng_split(keys[1], 3)
        speaker_classifier = {
            "fc1": nn.linear_init(kk[0], pe_dim, pe_dim, "relu"),
            "fc2": nn.linear_init(kk[1], pe_dim, pe_dim, "relu"),
            "fc3": nn.linear_init(kk[2], pe_dim, hp.n_speakers - 1),
        }

        # ---- phoneme encoder ----
        ph = self.ph_cfg
        kk = nn.rng_split(keys[2], 1 + ph["nb_blocks"])
        phoneme_encoder = {
            "symbols_embedding": nn.embedding_init(kk[0], hp.n_symbols, E),
            "blocks": [
                nn.fft_block_init(kk[1 + i], E, ph["attn_nb_heads"],
                                  ph["conv_channels"], ph["conv_kernel"])
                for i in range(ph["nb_blocks"])
            ],
        }

        # ---- local prosody predictor ----
        pp = self.pp_cfg
        kk = nn.rng_split(keys[3], 2 * pp["nb_blocks"] + 1)
        pp_blocks = []
        for i in range(pp["nb_blocks"]):
            in_ch = E if i == 0 else pp["conv_channels"]
            pp_blocks.append({
                "conv1": nn.conv1d_init(kk[2 * i], in_ch,
                                        pp["conv_channels"],
                                        pp["conv_kernel"], "relu"),
                "ln1": nn.layer_norm_init(pp["conv_channels"]),
                "conv2": nn.conv1d_init(kk[2 * i + 1], pp["conv_channels"],
                                        pp["conv_channels"],
                                        pp["conv_kernel"], "relu"),
                "ln2": nn.layer_norm_init(pp["conv_channels"]),
            })
        prosody_predictor = {
            "blocks": pp_blocks,
            "projection": nn.linear_init(kk[-1], pp["conv_channels"], 3),
        }

        # ---- gaussian upsampling ----
        gu_kernel = hp.gaussian_upsampling_module["conv_kernel"]
        kk = nn.rng_split(keys[4], 4)
        gaussian_upsampling = {
            "duration_projection": nn.conv1d_init(kk[0], 1, E, gu_kernel),
            "energy_projection": nn.conv1d_init(kk[1], 1, E, gu_kernel),
            "pitch_projection": nn.conv1d_init(kk[2], 1, E, gu_kernel),
            "range_predictor": nn.linear_init(kk[3], E, 1, "relu"),
        }

        # ---- frame decoder ----
        fd = self.fd_cfg
        kk = nn.rng_split(keys[5], 1 + fd["nb_blocks"])
        frame_decoder = {
            "blocks": [
                nn.fft_block_init(kk[i], E, fd["attn_nb_heads"],
                                  fd["conv_channels"], fd["conv_kernel"])
                for i in range(fd["nb_blocks"])
            ],
            "projection": nn.linear_init(kk[-1], E, hp.n_mel_channels),
        }

        return {
            "prosody_encoder": prosody_encoder,
            "speaker_classifier": speaker_classifier,
            "phoneme_encoder": phoneme_encoder,
            "prosody_predictor": prosody_predictor,
            "gaussian_upsampling": gaussian_upsampling,
            "frame_decoder": frame_decoder,
        }

    # ==================================================================
    # Submodule forwards
    # ==================================================================
    def _prenet(self, params, x, rng, deterministic):
        pe = self.pe_cfg
        for i in (1, 2, 3):
            # Chain stays in the compute dtype between layers: the
            # (B, T, 1024) hidden would otherwise make f32 HBM round
            # trips that dominate the prenet's wall time (LayerNorm
            # statistics are still computed in f32). The final LN output
            # is f32 for the downstream additive combination.
            last = i == 3
            x = nn.conv1d_apply(params[f"conv{i}"], x, self.dtype,
                                out_dtype=self.dtype,
                                matmul_form=not deterministic)
            x = jax.nn.relu(x)
            x = nn.layer_norm_apply(
                params[f"ln{i}"], x,
                out_dtype=jnp.float32 if last else self.dtype)
            rng, sub = jax.random.split(rng)
            x = nn.dropout(sub, x, pe["conv_dropout"], deterministic)
        return x

    def prosody_encoder(self, params, frames_energy, frames_pitch, mel_specs,
                        speaker_ids, output_lengths, rng, deterministic):
        """Returns (prosody_embed, encoder_film, pred_film, decoder_film).

        film tensors: (B, nb_blocks, 2 * channels) -- [gammas | betas].
        """
        pe = self.pe_cfg
        hp = self.hp
        T = mel_specs.shape[-1]
        pos = self._pos_table_pe[:T]

        energy = nn.conv1d_apply(params["energy_embedding"],
                                 frames_energy[..., None], self.dtype,
                                 matmul_form=not deterministic)
        pitch = nn.conv1d_apply(params["pitch_embedding"],
                                frames_pitch[..., None], self.dtype,
                                matmul_form=not deterministic)
        rng, sub = jax.random.split(rng)
        x = self._prenet(params["prenet"], jnp.swapaxes(mel_specs, 1, 2),
                         sub, deterministic)

        valid = mask_from_lengths(output_lengths, T)
        x = x + energy + pitch + pos[None]
        x = jnp.where(valid[..., None], x, 0.0)
        for block in params["blocks"]:
            rng, sub = jax.random.split(rng)
            x = nn.fft_block_apply(
                block, x, None, valid, num_heads=pe["attn_nb_heads"],
                attn_dropout=pe["attn_dropout"],
                conv_dropout=pe["conv_dropout"], rng=sub,
                deterministic=deterministic, dtype=self.dtype)

        # Masked mean-pool over time.
        pooled = jnp.sum(x, axis=1) / output_lengths[:, None].astype(
            jnp.float32)
        prosody_embed = pooled
        spk = nn.embedding_apply(params["spk_embedding"], speaker_ids)
        h = pooled + spk

        gammas = nn.linear_apply(params["gammas_predictor"], h, self.dtype)
        betas = nn.linear_apply(params["betas_predictor"], h, self.dtype)

        films = []
        col, blk = 0, 0
        for _, (nb_blocks, channels) in self.module_params.items():
            n = nb_blocks * channels
            g = gammas[:, col:col + n].reshape(-1, nb_blocks, channels)
            b = betas[:, col:col + n].reshape(-1, nb_blocks, channels)
            if hp.post_mult_weight != 0.0:
                post = params["post_multipliers"]
                g_post = post[0, blk:blk + nb_blocks][None, :, None]
                b_post = post[1, blk:blk + nb_blocks][None, :, None]
            else:
                g_post = b_post = 1.0
            g = g_post * g + 1.0
            b = b_post * b
            films.append(jnp.concatenate([g, b], axis=2))
            col += n
            blk += nb_blocks
        encoder_film, pred_film, decoder_film = films
        return prosody_embed, encoder_film, pred_film, decoder_film

    def speaker_classifier(self, params, x):
        hp = self.hp
        x = gradient_reversal(x, hp.lambda_reversal)
        x = jax.nn.relu(nn.linear_apply(params["fc1"], x, self.dtype))
        x = jax.nn.relu(nn.linear_apply(params["fc2"], x, self.dtype))
        return nn.linear_apply(params["fc3"], x, self.dtype)

    def phoneme_encoder(self, params, symbols, film, input_lengths, rng,
                        deterministic):
        ph = self.ph_cfg
        L = symbols.shape[-1]
        x = nn.embedding_apply(params["symbols_embedding"], symbols)
        x = x + self._pos_table[:L][None]
        valid = mask_from_lengths(input_lengths, L)
        x = jnp.where(valid[..., None], x, 0.0)
        for idx, block in enumerate(params["blocks"]):
            rng, sub = jax.random.split(rng)
            x = nn.fft_block_apply(
                block, x, film[:, idx, :], valid,
                num_heads=ph["attn_nb_heads"],
                attn_dropout=ph["attn_dropout"],
                conv_dropout=ph["conv_dropout"], rng=sub,
                deterministic=deterministic, dtype=self.dtype)
        return x

    def prosody_predictor(self, params, x, film, input_lengths, rng,
                          deterministic):
        pp = self.pp_cfg
        L = x.shape[1]
        for idx, block in enumerate(params["blocks"]):
            for j in (1, 2):
                x = nn.conv1d_apply(block[f"conv{j}"], x, self.dtype,
                                    matmul_form=not deterministic)
                x = jax.nn.relu(x)
                x = nn.layer_norm_apply(block[f"ln{j}"], x)
                rng, sub = jax.random.split(rng)
                x = nn.dropout(sub, x, pp["conv_dropout"], deterministic)
            n = x.shape[-1]
            gammas = film[:, idx, :n][:, None, :]
            betas = film[:, idx, n:][:, None, :]
            x = gammas * x + betas
        valid = mask_from_lengths(input_lengths, L)
        x = jnp.where(valid[..., None], x, 0.0)
        preds = nn.linear_apply(params["projection"], x, self.dtype)
        preds = jnp.where(valid[..., None], preds, 0.0)
        return preds[..., 0], preds[..., 1], preds[..., 2]

    def gaussian_upsampling(self, params, x, durations_float, durations_int,
                            energies, pitch, input_lengths, max_frames,
                            deterministic=True):
        mm = not deterministic  # conv grads lower best as shifted matmuls
        dur = nn.conv1d_apply(params["duration_projection"],
                              durations_float[..., None], self.dtype,
                              matmul_form=mm)
        nrg = nn.conv1d_apply(params["energy_projection"],
                              energies[..., None], self.dtype,
                              matmul_form=mm)
        pit = nn.conv1d_apply(params["pitch_projection"],
                              pitch[..., None], self.dtype,
                              matmul_form=mm)
        x = x + nrg + pit
        range_inputs = x + dur
        ranges = jax.nn.softplus(
            nn.linear_apply(params["range_predictor"], range_inputs,
                            self.dtype))[..., 0]
        valid = mask_from_lengths(input_lengths, x.shape[1])
        ranges = jnp.where(valid, ranges, 1.0)
        return gaussian_upsample(x, durations_int, ranges, valid, max_frames)

    def frame_decoder(self, params, x, film, output_lengths, rng,
                      deterministic):
        fd = self.fd_cfg
        T = x.shape[1]
        x = x + self._pos_table[:T][None]
        valid = mask_from_lengths(output_lengths, T)
        x = jnp.where(valid[..., None], x, 0.0)
        for idx, block in enumerate(params["blocks"]):
            rng, sub = jax.random.split(rng)
            x = nn.fft_block_apply(
                block, x, film[:, idx, :], valid,
                num_heads=fd["attn_nb_heads"],
                attn_dropout=fd["attn_dropout"],
                conv_dropout=fd["conv_dropout"], rng=sub,
                deterministic=deterministic, dtype=self.dtype)
        mel = nn.linear_apply(params["projection"], x, self.dtype)
        mel = jnp.where(valid[..., None], mel, 0.0)
        return jnp.swapaxes(mel, 1, 2)  # (B, n_mels, T)

    # ==================================================================
    # Training forward (teacher-forced prosody)
    # ==================================================================
    def forward(self, params, inputs, rng, train: bool = True):
        """Training forward pass.

        :param inputs: tuple (symbols, durations_float, durations_int,
            symbols_energy, symbols_pitch, input_lengths, frames_energy,
            frames_pitch, mel_specs, output_lengths, speaker_ids) --
            all padded to static buckets.
        :return: (speaker_preds, film_params, encoder_preds,
                  decoder_preds, alignments) matching the reference
                  output structure (model.py:755-787).
        """
        (symbols, durations_float, durations_int, symbols_energy,
         symbols_pitch, input_lengths, frames_energy, frames_pitch,
         mel_specs, output_lengths, speaker_ids) = inputs
        deterministic = not train
        # 4 independent keys: re-splitting the parent key after use
        # would alias the decoder's key with r2 (split(k, 2) is a
        # prefix of split(k, 3)), correlating dropout masks
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        prosody_embed, encoder_film, pred_film, decoder_film = \
            self.prosody_encoder(params["prosody_encoder"], frames_energy,
                                 frames_pitch, mel_specs, speaker_ids,
                                 output_lengths, r1, deterministic)
        spk_preds = self.speaker_classifier(params["speaker_classifier"],
                                            prosody_embed)
        enc_outputs = self.phoneme_encoder(params["phoneme_encoder"],
                                           symbols, encoder_film,
                                           input_lengths, r2, deterministic)
        duration_preds, energy_preds, pitch_preds = self.prosody_predictor(
            params["prosody_predictor"], enc_outputs, pred_film,
            input_lengths, r3, deterministic)
        symbols_upsamp, weights = self.gaussian_upsampling(
            params["gaussian_upsampling"], enc_outputs, durations_float,
            durations_int, symbols_energy, symbols_pitch, input_lengths,
            max_frames=mel_specs.shape[-1], deterministic=deterministic)
        mel_spec_preds = self.frame_decoder(params["frame_decoder"],
                                            symbols_upsamp, decoder_film,
                                            output_lengths, r4,
                                            deterministic)

        post_mult = params["prosody_encoder"].get("post_multipliers", 1.0)
        film_params = [post_mult, encoder_film, pred_film, decoder_film]
        encoder_preds = [duration_preds, energy_preds, pitch_preds,
                         input_lengths]
        decoder_preds = [mel_spec_preds, output_lengths]
        return spk_preds, film_params, encoder_preds, decoder_preds, weights

    # ==================================================================
    # Inference (predicted prosody x user control factors)
    # ==================================================================
    def pitch_shift(self, pitch_preds, pitch_factors, speaker_ids,
                    pitch_means, pitch_stds):
        """Hz-domain pitch shift through per-speaker de/re-normalization.

        Vectorized parity with model.py:814-834; ``pitch_means`` /
        ``pitch_stds`` are (n_speakers,) arrays built from stats.json.
        """
        mean = jnp.take(pitch_means, speaker_ids)[:, None]
        std = jnp.take(pitch_stds, speaker_ids)[:, None]
        unvoiced = pitch_preds == 0.0
        hz = jnp.exp(std * pitch_preds + mean) + pitch_factors
        shifted = (jnp.log(jnp.maximum(hz, 1e-8)) - mean) / std
        return jnp.where(unvoiced, 0.0, shifted)

    def pitch_multiply(self, pitch_preds, pitch_factors):
        """Deviation-from-voiced-mean scaling (parity: model.py:836-864)."""
        voiced = pitch_preds != 0.0
        count = jnp.sum(voiced, axis=1, keepdims=True)
        mean = jnp.sum(jnp.where(voiced, pitch_preds, 0.0), axis=1,
                       keepdims=True) / jnp.maximum(count, 1)
        deviation = (pitch_preds - mean) * pitch_factors
        out = pitch_preds + deviation
        return jnp.where(voiced, out, 0.0)

    def inference_film(self, params, energy_refs, pitch_refs,
                       mel_spec_refs, ref_lengths, speaker_ids):
        """FiLM parameters from a batch of reference utterances.

        Split out of :meth:`inference` so serving can compute FiLM once
        per unique (reference, speaker) pair and reuse it across
        sentences -- the prosody encoder reads only the reference, so
        with a fixed style bank this removes ~60% of per-sentence work
        (the reference implementation recomputes it per batch row,
        generate.py:242-317).

        :return: (encoder_film, pred_film, decoder_film)
        """
        rng = jax.random.PRNGKey(0)  # unused (deterministic)
        _, encoder_film, pred_film, decoder_film = self.prosody_encoder(
            params["prosody_encoder"], energy_refs, pitch_refs,
            mel_spec_refs, speaker_ids, ref_lengths, rng,
            deterministic=True)
        return encoder_film, pred_film, decoder_film

    def inference_prosody(self, params, inputs, pitch_transform: str,
                          pitch_means, pitch_stds, films=None):
        """Symbol-rate half of inference: phoneme encoding + prosody
        prediction + control factors (everything before upsampling).

        Split from :meth:`inference_decode` so the engine can pick the
        decoder's static output-frame bucket from the predicted
        durations instead of always paying a ``T = max_frames`` decoder
        pass (the reference sizes outputs exactly, model.py:866-923).

        :return: (enc_outputs, decoder_film, encoder_preds) with
            encoder_preds = [duration_preds, durations_int,
            energy_preds, pitch_preds, input_lengths].
        """
        (symbols, dur_factors, energy_factors, pitch_factors, input_lengths,
         energy_refs, pitch_refs, mel_spec_refs, ref_lengths,
         speaker_ids) = inputs
        hp = self.hp
        rng = jax.random.PRNGKey(0)  # unused (deterministic)

        if films is None:
            films = self.inference_film(params, energy_refs, pitch_refs,
                                        mel_spec_refs, ref_lengths,
                                        speaker_ids)
        encoder_film, pred_film, decoder_film = films
        enc_outputs = self.phoneme_encoder(
            params["phoneme_encoder"], symbols, encoder_film, input_lengths,
            rng, deterministic=True)
        duration_preds, energy_preds, pitch_preds = self.prosody_predictor(
            params["prosody_predictor"], enc_outputs, pred_film,
            input_lengths, rng, deterministic=True)

        # Apply duration factors; zero out durations under the minimum
        # that yields one frame (model.py:789-812).
        duration_preds = duration_preds * dur_factors
        dur_min = (hp.filter_length / hp.sampling_rate) / 2.0
        duration_preds = jnp.where(duration_preds < dur_min, 0.0,
                                   duration_preds)
        durations_int = durations_to_int_frames(
            duration_preds, hp.sampling_rate, hp.filter_length,
            hp.hop_length, hp.centered)

        energy_preds = energy_preds * energy_factors
        energy_preds = jnp.where(durations_int == 0, 0.0, energy_preds)
        pitch_preds = jnp.where(durations_int == 0, 0.0, pitch_preds)
        if pitch_transform == "add":
            pitch_preds = self.pitch_shift(pitch_preds, pitch_factors,
                                           speaker_ids, pitch_means,
                                           pitch_stds)
        elif pitch_transform == "multiply":
            pitch_preds = self.pitch_multiply(pitch_preds, pitch_factors)
        else:
            raise NotImplementedError(pitch_transform)

        encoder_preds = [duration_preds, durations_int, energy_preds,
                         pitch_preds, input_lengths]
        return enc_outputs, decoder_film, encoder_preds

    def inference_decode(self, params, enc_outputs, decoder_film,
                         encoder_preds, max_frames: int):
        """Frame-rate half of inference: Gaussian upsampling + decoder.

        :param max_frames: static output frame budget T (a bucket).
        :return: (decoder_preds, weights) with decoder_preds =
            [mel_spec_preds, output_lengths, overflow]; ``overflow`` is
            a per-row bool flagging rows whose predicted total frames
            exceed ``max_frames`` (their tail is truncated — the
            reference sizes outputs exactly, model.py:914, so silent
            truncation would be a parity break worth surfacing).
        """
        rng = jax.random.PRNGKey(0)  # unused (deterministic)
        (duration_preds, durations_int, energy_preds, pitch_preds,
         input_lengths) = encoder_preds
        symbols_upsamp, weights = self.gaussian_upsampling(
            params["gaussian_upsampling"], enc_outputs, duration_preds,
            durations_int, energy_preds, pitch_preds, input_lengths,
            max_frames=max_frames)
        total_frames = jnp.sum(durations_int, axis=1)
        output_lengths = jnp.minimum(total_frames, max_frames)
        overflow = total_frames > max_frames
        mel_spec_preds = self.frame_decoder(
            params["frame_decoder"], symbols_upsamp, decoder_film,
            output_lengths, rng, deterministic=True)
        return [mel_spec_preds, output_lengths, overflow], weights

    def inference(self, params, inputs, pitch_transform: str,
                  pitch_means, pitch_stds, max_frames: int,
                  films=None):
        """Inference with prosody control factors (fused single graph).

        :param inputs: (symbols, dur_factors, energy_factors,
            pitch_factors, input_lengths, energy_refs, pitch_refs,
            mel_spec_refs, ref_lengths, speaker_ids)
        :param pitch_transform: 'add' | 'multiply' (static)
        :param max_frames: static output frame budget T
        :param films: optional precomputed (encoder_film, pred_film,
            decoder_film) from :meth:`inference_film`; the reference
            features in ``inputs`` are then ignored.
        :return: (encoder_preds, decoder_preds, weights); decoder_preds
            = [mel_spec_preds, output_lengths, overflow] (see
            :meth:`inference_decode`).
        """
        enc_outputs, decoder_film, encoder_preds = self.inference_prosody(
            params, inputs, pitch_transform, pitch_means, pitch_stds,
            films=films)
        decoder_preds, weights = self.inference_decode(
            params, enc_outputs, decoder_film, encoder_preds, max_frames)
        return encoder_preds, decoder_preds, weights

    # ==================================================================
    def num_params(self, params) -> int:
        return sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))
