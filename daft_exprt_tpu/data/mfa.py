"""Montreal Forced Aligner integration: corpus prep + marker extraction.

MFA stays an external host tool (exactly as in the reference —
/root/reference/src/daft_exprt/mfa.py shells out to ``mfa align``); this
module prepares per-speaker corpora (.lab transcripts), invokes the CLI
when available, and ingests the resulting .TextGrid alignments into
``.markers`` files:

    begin \t end \t phone \t word \t word_idx

with the reference's exact sanitation semantics (mfa.py:72-163): MFA
silence/unk spellings canonicalized, consecutive silences merged, files
with unknown words or silences inside a word rejected, leading/trailing
silences trimmed, timing contiguity asserted.
"""

from __future__ import annotations

import logging
import os
import subprocess
from shutil import move, rmtree

from daft_exprt_tpu.data.textgrid import read_textgrid
from daft_exprt_tpu.symbols import (MFA_SIL_PHONE_SYMBOLS,
                                    MFA_SIL_WORD_SYMBOL,
                                    MFA_UNK_PHONE_SYMBOL,
                                    MFA_UNK_WORD_SYMBOL, SIL_PHONE_SYMBOL,
                                    SIL_WORD_SYMBOL)
from daft_exprt_tpu.text import text_cleaner
from daft_exprt_tpu.utils import launch_multi_process, worker_logger

_logger = logging.getLogger(__name__)


def prepare_corpus(corpus_dir: str, language: str):
    """Write a cleaned .lab transcript next to each wav for MFA.

    Expects ``corpus_dir`` to hold ``wavs/`` and ``metadata.csv``
    (``wav_file_name|text`` lines). A .lab is written only when exactly
    one metadata line matches the wav.
    """
    wavs_dir = os.path.join(corpus_dir, "wavs")
    metadata = os.path.join(corpus_dir, "metadata.csv")
    assert os.path.isdir(wavs_dir), f"There is no such directory: {wavs_dir}"
    assert os.path.isfile(metadata), f"There is no such file: {metadata}"

    with open(metadata, encoding="utf-8") as f:
        lines = [x.strip().split("|") for x in f.readlines()]
    for line in lines:
        assert len(line) == 2, f"Bad metadata line in {corpus_dir}: {line}"
    texts = {line[0].strip(): line[1].strip() for line in lines}
    counts = {}
    for line in lines:
        counts[line[0].strip()] = counts.get(line[0].strip(), 0) + 1

    for fname in os.listdir(wavs_dir):
        if not fname.endswith(".wav"):
            continue
        wav_name = fname[:-4].strip()
        if counts.get(wav_name) == 1:
            text = text_cleaner(texts[wav_name], language).strip()
            with open(os.path.join(wavs_dir, f"{wav_name}.lab"), "w",
                      encoding="utf-8") as f:
                f.write(text)


def parse_textgrid_markers(text_grid_file: str, logger=None):
    """Parse one MFA .TextGrid into sanitized marker rows (or None).

    :return: list of [begin, end, phone, word, word_idx] string rows, or
             None when the file must be rejected (unknown word/phone, or
             a silence inside a word).
    """
    logger = logger or _logger
    tiers = read_textgrid(text_grid_file)
    words = [[iv.start_time, iv.end_time, iv.text]
             for iv in tiers["words"].intervals]
    phones = [[iv.start_time, iv.end_time, iv.text]
              for iv in tiers["phones"].intervals]

    # canonicalize silence spellings
    for marker in words:
        if marker[2] == MFA_SIL_WORD_SYMBOL:
            marker[2] = SIL_WORD_SYMBOL
    for marker in phones:
        if marker[2] in MFA_SIL_PHONE_SYMBOLS:
            marker[2] = SIL_PHONE_SYMBOL

    # merge consecutive phone-level silences
    merged = [phones[0]]
    for marker in phones[1:]:
        if merged[-1][2] == marker[2] == SIL_PHONE_SYMBOL:
            merged[-1][1] = marker[1]
        else:
            merged.append(marker)
    phones = merged

    # reject files containing unknown words/phones
    if (MFA_UNK_WORD_SYMBOL in [w for _, _, w in words]
            or MFA_UNK_PHONE_SYMBOL in [p for _, _, p in phones]):
        logger.warning(f"{text_grid_file} -- unknown word -- ignoring file")
        return None

    markers = []
    for word_idx, (begin_word, end_word, word) in enumerate(words):
        for begin_phone, end_phone, phone in phones:
            if begin_word <= begin_phone and end_phone <= end_word:
                if word == SIL_WORD_SYMBOL:
                    assert (phone == SIL_PHONE_SYMBOL
                            and begin_word == begin_phone
                            and end_word == end_phone), (
                        f"{text_grid_file} -- silence mismatch at word "
                        f"{word_idx}")
                elif phone == SIL_PHONE_SYMBOL:
                    logger.warning(
                        f"{text_grid_file} -- silence within word "
                        f"{word_idx} -- ignoring file")
                    return None
                markers.append([f"{begin_phone:.3f}", f"{end_phone:.3f}",
                                phone, word, str(word_idx)])
            else:
                assert (end_phone <= begin_word or end_word <= begin_phone), (
                    f"{text_grid_file} -- word/phone overlap at word "
                    f"{word_idx}")

    # trim leading/trailing silences
    if markers and markers[0][2] == SIL_PHONE_SYMBOL:
        markers.pop(0)
    if markers and markers[-1][2] == SIL_PHONE_SYMBOL:
        markers.pop(-1)
    assert markers and markers[0][2] != SIL_PHONE_SYMBOL \
        and markers[-1][2] != SIL_PHONE_SYMBOL, (
        f"{text_grid_file} -- problem with sentence trimming")

    # timing contiguity
    for cur, nxt in zip(markers[:-1], markers[1:]):
        assert float(cur[1]) == float(nxt[0]), (
            f"{text_grid_file} -- non-contiguous timings")
        assert float(cur[0]) < float(cur[1]), (
            f"{text_grid_file} -- non-increasing timings")
    assert float(markers[-1][0]) < float(markers[-1][1]), (
        f"{text_grid_file} -- non-increasing timings")
    return markers


def _extract_markers(text_grid_file, log_queue):
    logger = worker_logger(log_queue)
    markers = parse_textgrid_markers(text_grid_file, logger)
    if markers is None:
        return
    out = text_grid_file[:-len(".TextGrid")] + ".markers"
    with open(out, "w", encoding="utf-8") as f:
        f.writelines("\t".join(row) + "\n" for row in markers)


def extract_markers(text_grid_dir: str, n_jobs: int):
    """Convert every un-processed .TextGrid in a dir to .markers."""
    all_grids = [os.path.join(text_grid_dir, x)
                 for x in os.listdir(text_grid_dir)
                 if x.endswith(".TextGrid")]
    todo = [x for x in all_grids
            if not os.path.isfile(x[:-len(".TextGrid")] + ".markers")]
    _logger.info(
        f"Folder: {text_grid_dir} -- {len(all_grids) - len(todo)} TextGrid "
        f"files already processed -- {len(todo)} to process")
    launch_multi_process(iterable=todo, func=_extract_markers, n_jobs=n_jobs,
                         timer_verbose=False)


def _move_file(file, src_dir, dst_dir, log_queue):
    move(os.path.join(src_dir, file), os.path.join(dst_dir, file))


def mfa(dataset_dir: str, hparams, n_jobs: int):
    """Run MFA alignment + marker extraction for every speaker corpus.

    Idempotent: a speaker with an existing ``align/`` directory only
    re-runs marker extraction for new TextGrids.
    """
    for speaker in hparams.speakers:
        _logger.info(f'Speaker: "{speaker}"')
        corpus_dir = os.path.join(dataset_dir, speaker)
        align_out_dir = os.path.join(corpus_dir, "align")
        wavs_dir = os.path.join(corpus_dir, "wavs")
        if not os.path.isdir(align_out_dir):
            temp_dir = os.path.join(corpus_dir, "tmp")
            prepare_corpus(corpus_dir, hparams.language)
            _logger.info("Performing forced alignment (external MFA CLI)")
            subprocess.run(
                ["mfa", "align", corpus_dir, hparams.mfa_dictionary,
                 hparams.mfa_acoustic_model, align_out_dir,
                 "-t", os.path.join(temp_dir, "align"),
                 "-j", str(n_jobs), "-v", "-c"],
                check=True)
            # MFA mirrors the corpus layout: TextGrids land in align/wavs
            text_grid_dir = os.path.join(align_out_dir, "wavs")
            if os.path.isdir(text_grid_dir):
                files = os.listdir(text_grid_dir)
                launch_multi_process(
                    iterable=files, func=_move_file, n_jobs=n_jobs,
                    src_dir=text_grid_dir, dst_dir=align_out_dir,
                    timer_verbose=False)
                rmtree(text_grid_dir, ignore_errors=True)
            extract_markers(align_out_dir, n_jobs)
            # keep transcripts next to the markers
            labs = [x for x in os.listdir(wavs_dir) if x.endswith(".lab")]
            launch_multi_process(
                iterable=labs, func=_move_file, n_jobs=n_jobs,
                src_dir=wavs_dir, dst_dir=align_out_dir,
                timer_verbose=False)
            rmtree(temp_dir, ignore_errors=True)
        else:
            _logger.info("MFA alignment already performed")
            extract_markers(align_out_dir, n_jobs)
        wavs = [x for x in os.listdir(wavs_dir) if x.endswith(".wav")]
        markers = [x for x in os.listdir(align_out_dir)
                   if x.endswith(".markers")]
        if wavs:
            _logger.info(
                f"{len(markers) / len(wavs) * 100:.2f}% of the data set "
                f"aligned")
