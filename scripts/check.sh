#!/usr/bin/env bash
# Commit gate: the minimum bar before ANY commit (README "Tests").
#
# Runs (1) the fast tier (~1-2 min: unit/kernel-level, no full-model
# compiles) and (2) every test module that plausibly covers a file
# changed since the given base (default: HEAD). A "small" fix that
# breaks a sibling e2e test is caught here, not by the next reviewer
# (round-2 postmortem: two parity fixes shipped without re-running the
# suite and broke 4 end-to-end tests).
#
# Usage:
#   scripts/check.sh            # fast tier + tests for uncommitted changes
#   scripts/check.sh HEAD~3     # fast tier + tests for the last 3 commits
#   scripts/check.sh --full     # the whole suite (pre-snapshot bar)

set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--full" ]]; then
    exec python -m pytest tests/ -q
fi

base="${1:-HEAD}"
changed=$( { git diff --name-only "$base"; git diff --name-only --cached; \
             git ls-files --others --exclude-standard; } | sort -u )

# map changed sources to the test modules that exercise them.
# plain newline list + sort -u (not an associative array): portable to
# bash 3.2 (macOS default) and safe under set -u when empty.
want=""
add() { want="$want$1
"; }
for f in $changed; do
    case "$f" in
        tests/test_*.py)            add $f ;;
        tests/helpers.py|tests/conftest.py)
            # shared fixtures: run every e2e module that fabricates
            # checkpoints with them
            for t in tests/test_cli.py tests/test_serve.py \
                     tests/test_style_bank.py tests/test_pipeline.py; do
                add $t; done ;;
        daft_exprt_tpu/*|native/*|scripts/*.py|scripts/evaluation/*|tools/*.py|__graft_entry__.py)
            stem=$(basename "$f" .py)
            # direct name match (pitch -> test_pitch, mel -> test_mel, ...)
            for t in tests/test_"$stem"*.py; do
                [[ -e "$t" ]] && add $t; done
            # subsystem map for files whose tests live under other names
            case "$f" in
                daft_exprt_tpu/audio/pitch*|daft_exprt_tpu/bin/*|native/*)
                    add tests/test_pitch.py
                    add tests/test_reaper_golden.py ;;
                daft_exprt_tpu/inference/*)
                    add tests/test_cli.py
                    add tests/test_style_bank.py
                    add tests/test_serve.py
                    add tests/test_output_bucketing.py
                    add tests/test_film_cache.py
                    add tests/test_inference_mesh.py ;;
                daft_exprt_tpu/training/*)
                    add tests/test_train_step.py
                    add tests/test_pipeline.py
                    add tests/test_checkpoint.py
                    add tests/test_loss.py ;;
                daft_exprt_tpu/models/*|daft_exprt_tpu/ops/*)
                    add tests/test_model.py
                    add tests/test_modules.py
                    add tests/test_torch_parity.py ;;
                daft_exprt_tpu/vocoder/*)
                    add tests/test_vocoder.py
                    add tests/test_vocoder_train.py
                    add tests/test_streaming_vocoder.py
                    add tests/test_fused_vocoder.py
                    add tests/test_mrf_vocoder.py
                    add tests/test_serve.py ;;
                daft_exprt_tpu/data/*)
                    add tests/test_pipeline.py ;;
                daft_exprt_tpu/text/*)
                    add tests/test_text.py
                    add tests/test_text_fuzz.py
                    add tests/test_phonemizer.py ;;
                daft_exprt_tpu/parallel/*|daft_exprt_tpu/aot.py)
                    add tests/test_train_step.py
                    add tests/test_inference_mesh.py
                    add tests/test_aot_cache.py ;;
                scripts/serve.py)  add tests/test_serve.py ;;
                scripts/synthesize.py|scripts/evaluation/*)
                    add tests/test_cli.py
                    add tests/test_style_bank.py ;;
                scripts/training.py|scripts/train_vocoder.py)
                    add tests/test_pipeline.py
                    add tests/test_vocoder_train.py ;;
                tools/convert_checkpoint.py|tools/export_acoustic_torch.py)
                    add tests/test_torch_parity.py
                    add tests/test_checkpoint.py ;;
            esac ;;
    esac
done

targets=$(printf '%s' "$want" | sort -u | while read -r t; do
              [[ -n "$t" && -e "$t" ]] && echo "$t" || true; done)

echo "== fast tier =="
python -m pytest tests/ -m fast -q --no-header

if [[ -n "$targets" ]]; then
    echo "== changed-coverage tier =="
    echo "$targets" | sed 's/^/  /'
    # shellcheck disable=SC2086
    python -m pytest $targets -q --no-header
else
    echo "== no source changes vs $base; fast tier only =="
fi
echo "check.sh: OK"
