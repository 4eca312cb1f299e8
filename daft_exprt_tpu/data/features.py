"""Feature extraction: wav + markers -> training features on disk.

Per utterance (behavioral parity with the reference pipeline,
/root/reference/src/daft_exprt/extract_features.py:387-496):

1. trim the wav to the aligned speech span (markers were
   silence-trimmed at ingestion);
2. HiFi-GAN-exact log-mel via the JAX STFT kernel (ops/mel.py);
3. quantize phone durations to integer frame counts
   (ops/durations.py, exact reference boundary semantics);
4. rewrite markers: timings re-based to 0, word-boundary symbols
   (punctuation/whitespace) and EOS inserted, int durations attached;
5. per-frame energy (L2 norm of linear-mel columns) + per-symbol mean;
6. per-frame log-F0 (audio/pitch.py NCCF tracker, REAPER-framing
   contract) + per-symbol voiced mean.

Artifacts per speaker features dir: ``{file}.npy`` (n_mels, T) log-mel,
``{file}.markers`` (begin end int_dur symbol word word_idx TSV),
``{file}.frames_nrg``, ``{file}.symbols_nrg``, ``{file}.frames_f0``,
``{file}.symbols_f0``, ``config.json``.

Incremental: files with an existing ``.symbols_f0`` are skipped.
"""

from __future__ import annotations

import logging
import os
import re

import numpy as np

from daft_exprt_tpu.audio.io import load_wav
from daft_exprt_tpu.audio.pitch import extract_pitch
from daft_exprt_tpu.ops.durations import duration_to_integer
from daft_exprt_tpu.ops.mel import extract_energy, mel_spectrogram_hifi
from daft_exprt_tpu.symbols import (ASCII_LETTERS, EOS, PUNCTUATION,
                                    SIL_WORD_SYMBOL, WHITESPACE)
from daft_exprt_tpu.utils import launch_multi_process, worker_logger

_logger = logging.getLogger(__name__)


# ----------------------------------------------------------------------
# Sentence/marker word matching
# ----------------------------------------------------------------------
def split_sentence_words(sentence: str, language: str):
    """Split a cleaned sentence into word / punctuation tokens.

    Returns (words, end_punctuation): leading punctuation dropped,
    trailing punctuation reduced to the last one (or None).
    """
    if language != "english":
        raise NotImplementedError(language)
    all_chars = ASCII_LETTERS + PUNCTUATION
    tokens = re.findall(rf"[\w']+|[{PUNCTUATION}]", sentence.lower().strip())
    tokens = [t for t in tokens if re.sub(rf"[^{all_chars}]", "", t)]
    while tokens and tokens[0] in PUNCTUATION:
        tokens.pop(0)
    end_punct = None
    while tokens and tokens[-1] in PUNCTUATION:
        end_punct = tokens.pop(-1)
    return tokens, end_punct


def update_markers(file_name, marker_rows, sentence, sent_begin,
                   int_durations, hparams, logger=None):
    """Rebase timings, insert word boundaries + EOS, attach int durs.

    :param marker_rows: [[begin, end, phone, word, word_idx], ...]
    :param sentence: the cleaned .lab transcript
    :param sent_begin: original begin time of the first marker (sec)
    :param int_durations: frame counts, one per marker row
    :return: [[begin, end, int_dur, symbol, word, word_idx], ...] or
             None on a word-correspondence failure.
    """
    logger = logger or _logger
    sent_words, end_punct = split_sentence_words(sentence, hparams.language)

    rows = [list(r) for r in marker_rows]
    durs = list(int_durations)
    out, word_idx = [], 0

    def emit(row, symbol, word, dur):
        begin = f"{float(row[0]) - sent_begin:.3f}"
        end = f"{float(row[1]) - sent_begin:.3f}"
        out.append([begin, end, str(dur), symbol, word, str(word_idx)])

    while sent_words:
        sent_word = sent_words.pop(0)
        marker_word, marker_word_idx = rows[0][3], rows[0][4]
        if marker_word != sent_word:
            # apostrophe artifacts: "example'" vs "example", or
            # "that's" aligned as two words ["that", "s"]
            pieces = re.findall(rf"[\w]+|[{PUNCTUATION}]", sent_word)
            if len(pieces) == 1:
                sent_word = pieces[0]
            else:
                sent_words = pieces + sent_words
                sent_word = sent_words.pop(0)
            if marker_word != sent_word:
                logger.warning(
                    f"{file_name} -- word mismatch between .lab sentence "
                    f'and markers ("{sent_word}" vs "{marker_word}") -- '
                    f"ignoring file")
                return None
        # emit all phone rows of this word
        while rows and rows[0][4] == marker_word_idx:
            row = rows.pop(0)
            emit(row, row[2], row[3], durs.pop(0))
        word_idx += 1
        # word boundary between consecutive words
        if sent_words:
            bound = sent_words.pop(0) if sent_words[0] in PUNCTUATION \
                else WHITESPACE
            if rows and rows[0][3] == SIL_WORD_SYMBOL:
                row = rows.pop(0)
                emit(row, bound, bound, durs.pop(0))
            else:
                end_prev = out[-1][1]
                out.append([end_prev, end_prev, "0", bound, bound,
                            str(word_idx)])
            word_idx += 1

    if end_punct is not None:
        end_prev = out[-1][1]
        out.append([end_prev, end_prev, "0", end_punct, end_punct,
                    str(word_idx)])
        word_idx += 1
    end_prev = out[-1][1]
    out.append([end_prev, end_prev, "0", EOS, EOS, str(word_idx)])

    assert not sent_words and not rows and not durs, (
        f"{file_name} -- length mismatch after marker update: "
        f"({sent_words}, {rows}, {durs})")
    return out


# ----------------------------------------------------------------------
# Per-symbol aggregation (vectorized; the reference loops per marker)
# ----------------------------------------------------------------------
def symbols_mean(frame_values: np.ndarray, int_durs: np.ndarray,
                 voiced_only: bool = False) -> np.ndarray:
    """Mean of frame values per symbol segment; zero-duration -> 0.

    With ``voiced_only``, only frames > 0 contribute (and all-unvoiced
    segments yield 0) -- the per-symbol pitch rule.
    """
    int_durs = np.asarray(int_durs, np.int64)
    vals = np.asarray(frame_values, np.float64)
    # Exact segment sums via prefix sums: segment i is
    # [ends_i - dur_i, ends_i). (reduceat was wrong here: trailing
    # zero-duration symbols (EOS/end punctuation) have offsets ==
    # len(vals), and clipping them for reduceat silently dropped the
    # LAST REAL phone's final frame from its mean.)
    ends = np.clip(np.cumsum(int_durs), 0, len(vals))
    starts = np.clip(ends - int_durs, 0, len(vals))
    if voiced_only:
        mask = (vals > 0.0).astype(np.float64)
        cs_v = np.concatenate([[0.0], np.cumsum(vals * mask)])
        cs_m = np.concatenate([[0.0], np.cumsum(mask)])
        sums = cs_v[ends] - cs_v[starts]
        counts = cs_m[ends] - cs_m[starts]
    else:
        cs = np.concatenate([[0.0], np.cumsum(vals)])
        sums = cs[ends] - cs[starts]
        counts = int_durs.astype(np.float64)
    means = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
    means[int_durs == 0] = 0.0
    return means


def _fmt_col(values) -> list:
    return [f"{v:.3f}\n" for v in values]


# ----------------------------------------------------------------------
# Per-file extraction
# ----------------------------------------------------------------------
def min_phone_duration(marker_rows) -> float:
    return min(float(r[1]) - float(r[0]) for r in marker_rows)


def extract_features_for_file(markers_file: str, wav_file: str,
                              features_dir: str, hparams, logger=None):
    """Extract and save all features for one (markers, wav) pair.

    Single-file composition of the SAME stages the batched production
    path runs (``_prepare_one`` -> host mel+energy -> ``_write_features``)
    so the two cannot drift; the per-utterance host STFT here is the
    bit-exactness oracle for the batched device kernel
    (tests/test_pipeline.py). Returns the file name, or None if the
    file was rejected (logged).
    """
    item = _prepare_one((markers_file, wav_file), hparams, None,
                        logger=logger or _logger)
    if item is None:
        return None
    mel_spec = mel_spectrogram_hifi(item["wav"], hparams)
    frames_energy = extract_energy(np.exp(mel_spec))
    _write_features(features_dir, item, mel_spec, frames_energy)
    return item["file_name"]


def _prepare_one(files, hparams, log_queue, skip_pitch=False,
                 logger=None):
    """Pool worker: everything numpy-only (NO jax in forked workers).

    Loads + trims the wav, validates markers, quantizes durations,
    rewrites markers, runs the NCCF pitch tracker (unless
    ``skip_pitch`` -- the device_pitch path batches F0 on device in the
    main process instead). The mel/energy device kernel runs batched in
    the main process afterwards. Pass ``logger`` when calling in-process
    (no worker queue).
    """
    logger = logger or worker_logger(log_queue)
    markers_file, wav_file = files
    try:
        assert os.path.isfile(markers_file), f"missing {markers_file}"
        assert os.path.isfile(wav_file), f"missing {wav_file}"
        with open(markers_file, encoding="utf-8") as f:
            marker_rows = [line.strip().split("\t") for line in f
                           if line.strip()]
        fft_sec = hparams.filter_length / hparams.sampling_rate
        assert min_phone_duration(marker_rows) > fft_sec / 2, (
            f"{markers_file} -- phone shorter than filter_length/2")
        sent_begin = float(marker_rows[0][0])
        sent_end = float(marker_rows[-1][1])
        if sent_end - sent_begin < hparams.minimum_wav_duration / 1000:
            logger.warning(f"Ignoring {wav_file} -- too short after trim")
            return None
        wav, fs = load_wav(wav_file, target_sr=hparams.sampling_rate)
        wav = wav[int(sent_begin * fs):int(sent_end * fs)]

        # mel frame count is deterministic from the sample count and the
        # centering mode (centered: 1 + n // hop)
        from daft_exprt_tpu.ops.mel import num_frames
        nb_frames = num_frames(len(wav), hparams.filter_length,
                               hparams.hop_length, hparams.centered)

        float_durs = [[float(r[0]) - sent_begin, float(r[1]) - sent_begin]
                      for r in marker_rows]
        int_durs = duration_to_integer(float_durs, hparams,
                                       nb_samples=len(wav))
        assert len(int_durs) == len(marker_rows), markers_file
        assert sum(int_durs) == nb_frames, markers_file
        assert 0 not in int_durs, markers_file

        file_name = os.path.basename(markers_file)[:-len(".markers")]
        lab_file = os.path.join(os.path.dirname(markers_file),
                                f"{file_name}.lab")
        assert os.path.isfile(lab_file), f"missing {lab_file}"
        with open(lab_file, encoding="utf-8") as f:
            sentence = f.readline()
        markers = update_markers(file_name, marker_rows, sentence,
                                 sent_begin, int_durs, hparams, logger)
        if markers is None:
            return None
        if skip_pitch:
            frames_pitch = None
        else:
            frames_pitch = extract_pitch(wav, fs, hparams)
            assert len(frames_pitch) == nb_frames, markers_file
        return {"file_name": file_name, "wav": wav, "markers": markers,
                "frames_pitch": frames_pitch}
    except AssertionError as e:
        logger.warning(str(e))
        return None


def _mel_energy_batched(wavs: list, hparams):
    """Batched on-device mel+energy, bit-exact with per-utterance STFT.

    Wavs are right-padded to a common sample bucket. The reflect
    padding a per-utterance centered STFT would apply at the true end
    is written manually into the padding region, so cropped frames are
    identical to single-utterance extraction.
    """
    from daft_exprt_tpu.ops.mel import mel_and_energy_batch
    hop, n_fft = hparams.hop_length, hparams.filter_length
    pad = n_fft // 2
    sample_bucket = hop * 128
    max_len = max(len(w) for w in wavs) + pad
    S = ((max_len + sample_bucket - 1) // sample_bucket) * sample_bucket
    batch = np.zeros((len(wavs), S), np.float32)
    for i, w in enumerate(wavs):
        n = len(w)
        batch[i, :n] = w
        # np.pad 'reflect' right edge: padded sample j = w[n - 2 - j].
        # (w[n-2::-1][:m] rather than a stop of n-2-m: for m == n-1 that
        # stop is -1, which numpy reads as "end" and yields an empty
        # slice -> broadcast error for sub-window wavs)
        m = min(pad, n - 1)
        batch[i, n:n + m] = w[n - 2::-1][:m]
    log_mel, energy = mel_and_energy_batch(
        batch, hparams.sampling_rate, n_fft, hop, hparams.n_mel_channels,
        hparams.mel_fmin, hparams.mel_fmax, hparams.min_clipping,
        hparams.centered)
    log_mel = np.asarray(log_mel)
    energy = np.asarray(energy)
    from daft_exprt_tpu.ops.mel import num_frames
    out = []
    for i, w in enumerate(wavs):
        t = num_frames(len(w), n_fft, hop, hparams.centered)
        out.append((log_mel[i, :, :t], energy[i, :t]))
    return out


def _write_features(features_dir: str, item: dict, log_mel: np.ndarray,
                    frames_energy: np.ndarray):
    file_name = item["file_name"]
    markers = item["markers"]
    all_durs = np.array([int(r[2]) for r in markers])
    symbols_energy = symbols_mean(frames_energy, all_durs)
    symbols_pitch = symbols_mean(item["frames_pitch"], all_durs,
                                 voiced_only=True)
    os.makedirs(features_dir, exist_ok=True)
    np.save(os.path.join(features_dir, f"{file_name}.npy"),
            log_mel.astype(np.float32))
    with open(os.path.join(features_dir, f"{file_name}.markers"), "w",
              encoding="utf-8") as f:
        f.writelines("\t".join(r) + "\n" for r in markers)
    for name, vals in (("frames_nrg", frames_energy),
                       ("symbols_nrg", symbols_energy),
                       ("frames_f0", item["frames_pitch"]),
                       ("symbols_f0", symbols_pitch)):
        with open(os.path.join(features_dir, f"{file_name}.{name}"), "w",
                  encoding="utf-8") as f:
            f.writelines(_fmt_col(vals))


def _pitch_batched(items: list, hparams):
    """Fill ``frames_pitch`` for a chunk via the batched device tracker.

    Pads the chunk's wavs to a common length, runs the JAX NCCF +
    Viterbi kernel once, then applies the host path's exact
    sample-synchronous hold / quantization / downsampling per item.
    """
    from daft_exprt_tpu.audio.pitch import extract_pitch_from_frame_f0
    from daft_exprt_tpu.audio.pitch_jax import track_pitch_batch

    fs = hparams.sampling_rate
    lens = np.array([len(x["wav"]) for x in items])
    # coarse buckets (like _mel_energy_batched): nccf/viterbi jits are
    # shape-specialized, so fine-grained padding would recompile per
    # chunk on a real corpus
    bucket = hparams.hop_length * 128
    S = int(((lens.max() + bucket - 1) // bucket) * bucket)
    B = int(2 ** np.ceil(np.log2(max(len(items), 1))))
    batch = np.zeros((B, S), np.float32)
    for i, x in enumerate(items):
        batch[i, :lens[i]] = x["wav"]
    lens = np.concatenate([lens, np.zeros(B - len(items), np.int64)])
    f0, starts = track_pitch_batch(
        batch, lens, fs, frame_interval=hparams.f0_interval,
        min_f0=hparams.min_f0, max_f0=hparams.max_f0,
        uv_weight=hparams.uv_cost)
    f0 = np.asarray(f0)
    from daft_exprt_tpu.ops.mel import num_frames
    for i, item in enumerate(items):
        frames = extract_pitch_from_frame_f0(f0[i], starts, int(lens[i]),
                                             fs, hparams)
        nb_frames = num_frames(len(item["wav"]), hparams.filter_length,
                               hparams.hop_length, hparams.centered)
        assert len(frames) == nb_frames, item["file_name"]
        item["frames_pitch"] = frames


# ----------------------------------------------------------------------
# Orchestration
# ----------------------------------------------------------------------
def extract_features(dataset_dir: str, features_dir: str, hparams,
                     n_jobs: int, device_batch: int = 32,
                     device_pitch: bool = False):
    """Extract features for every speaker (incremental).

    Host pool (numpy) prepares wavs/markers (and, by default, F0);
    mel+energy run as bucketed batched device kernels in the main
    process. With ``device_pitch``, F0 tracking also runs as the
    batched JAX NCCF+Viterbi kernel on device, leaving the pool workers
    pure I/O. Validated byte-identical to the host tracker on test
    corpora, but the device NCCF runs f32 vs the host's f64 --
    extraction is incremental, so keep a corpus's runs on ONE tracker.
    """
    if device_pitch:
        _logger.info("device_pitch: F0 via the batched JAX tracker -- "
                     "keep incremental runs of a corpus on one tracker")
    for speaker in hparams.speakers:
        _logger.info(f'Speaker: "{speaker}"')
        wavs_dir = os.path.join(dataset_dir, speaker, "wavs")
        markers_dir = os.path.join(dataset_dir, speaker, "align")
        assert os.path.isdir(wavs_dir), f"missing {wavs_dir}"
        assert os.path.isdir(markers_dir), f"missing {markers_dir}"
        spk_features_dir = os.path.join(features_dir, speaker)
        metadata = os.path.join(spk_features_dir, "metadata.csv")
        assert os.path.isfile(metadata), f"missing {metadata}"

        with open(metadata, encoding="utf-8") as f:
            names = [line.strip().split("|")[0].strip() for line in f
                     if line.strip()]
        names = [x for x in names if os.path.isfile(
            os.path.join(markers_dir, f"{x}.markers"))]
        done = {x[:-len(".symbols_f0")] for x in os.listdir(spk_features_dir)
                if x.endswith(".symbols_f0")}
        todo = [x for x in names if x not in done]
        _logger.info(f"{len(done)} files already processed -- "
                     f"{len(todo)} new files to process")

        files = [(os.path.join(markers_dir, f"{x}.markers"),
                  os.path.join(wavs_dir, f"{x}.wav")) for x in todo]
        for chunk_start in range(0, len(files), device_batch):
            chunk = files[chunk_start:chunk_start + device_batch]
            items = launch_multi_process(
                iterable=chunk, func=_prepare_one, n_jobs=n_jobs,
                hparams=hparams, skip_pitch=device_pitch,
                timer_verbose=False)
            items = [x for x in items if x is not None]
            if not items:
                continue
            if device_pitch:
                _pitch_batched(items, hparams)
            mels = _mel_energy_batched([x["wav"] for x in items], hparams)
            for item, (log_mel, energy) in zip(items, mels):
                _write_features(spk_features_dir, item, log_mel, energy)
        hparams.save_hyper_params(
            os.path.join(spk_features_dir, "config.json"))
