"""One-time dataset formatters: LJSpeech and ESD -> expected layout.

Target layout per speaker (reference README.md:92-102):
    <speaker>/wavs/*.wav
    <speaker>/metadata.csv     # wav_file_name|text

Capability parity with /root/reference/scripts/format_dataset.py:
LJSpeech metadata rewrite (uses the normalized-text column) and ESD ->
per-speaker layout keeping the 10 English speakers (0011-0020).
"""

import argparse
import os
import sys
from shutil import copyfile, move

FILE_ROOT = os.path.dirname(os.path.realpath(__file__))
sys.path.insert(0, os.path.dirname(FILE_ROOT))


def format_lj_speech(lj_dir: str):
    """LJSpeech-1.1: metadata.csv has ``id|text|normalized_text``."""
    metadata = os.path.join(lj_dir, "metadata.csv")
    assert os.path.isfile(metadata), f"missing {metadata}"
    with open(metadata, encoding="utf-8") as f:
        lines = [line.strip().split("|") for line in f if line.strip()]
    out = []
    for parts in lines:
        file_name = parts[0].strip()
        text = parts[2].strip() if len(parts) > 2 and parts[2].strip() \
            else parts[1].strip()
        out.append(f"{file_name}|{text}\n")
    with open(metadata, "w", encoding="utf-8") as f:
        f.writelines(out)
    print(f"LJSpeech metadata rewritten: {len(out)} lines")


def format_esd(esd_dir: str, english_only: bool = True):
    """ESD: per-speaker dirs 0001-0020 with emotion subdirs and
    per-utterance .txt transcripts; English speakers are 0011-0020."""
    speakers = sorted(x for x in os.listdir(esd_dir)
                      if os.path.isdir(os.path.join(esd_dir, x))
                      and x.isdigit())
    if english_only:
        speakers = [x for x in speakers if int(x) >= 11]
    for speaker in speakers:
        spk_dir = os.path.join(esd_dir, speaker)
        wavs_dir = os.path.join(spk_dir, "wavs")
        os.makedirs(wavs_dir, exist_ok=True)
        meta_lines = {}
        # transcript file: <speaker>.txt with lines "file\ttext\temotion"
        trans = os.path.join(spk_dir, f"{speaker}.txt")
        if os.path.isfile(trans):
            with open(trans, encoding="utf-8", errors="ignore") as f:
                for line in f:
                    parts = line.strip().split("\t")
                    if len(parts) >= 2:
                        meta_lines[parts[0].strip()] = parts[1].strip()
        # move wavs from emotion subdirs into wavs/
        for root, _, files in os.walk(spk_dir):
            if os.path.basename(root) == "wavs":
                continue
            for fname in files:
                if fname.endswith(".wav"):
                    move(os.path.join(root, fname),
                         os.path.join(wavs_dir, fname))
        with open(os.path.join(spk_dir, "metadata.csv"), "w",
                  encoding="utf-8") as f:
            for name in sorted(meta_lines):
                f.write(f"{name}|{meta_lines[name]}\n")
        print(f"ESD speaker {speaker}: {len(meta_lines)} transcripts")


def main():
    parser = argparse.ArgumentParser(description="format datasets")
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("LJ")
    p.add_argument("--data_set_dir", required=True)
    p = sub.add_parser("ESD")
    p.add_argument("--data_set_dir", required=True)
    p.add_argument("--all_languages", action="store_true")
    args = parser.parse_args()
    if args.command == "LJ":
        format_lj_speech(args.data_set_dir)
    else:
        format_esd(args.data_set_dir,
                   english_only=not args.all_languages)


if __name__ == "__main__":
    main()
