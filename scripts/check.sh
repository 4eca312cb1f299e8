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

# map changed sources to the test modules that exercise them
declare -A want=()
for f in $changed; do
    case "$f" in
        tests/test_*.py)            want[$f]=1 ;;
        tests/helpers.py|tests/conftest.py)
            # shared fixtures: run every e2e module that fabricates
            # checkpoints with them
            for t in tests/test_cli.py tests/test_serve.py \
                     tests/test_style_bank.py tests/test_pipeline.py; do
                want[$t]=1; done ;;
        daft_exprt_tpu/*|native/*|scripts/*.py|scripts/evaluation/*|tools/*.py|__graft_entry__.py)
            stem=$(basename "$f" .py)
            # direct name match (pitch -> test_pitch, mel -> test_mel, ...)
            for t in tests/test_"$stem"*.py; do
                [[ -e "$t" ]] && want[$t]=1; done
            # subsystem map for files whose tests live under other names
            case "$f" in
                daft_exprt_tpu/audio/pitch*|daft_exprt_tpu/bin/*|native/*)
                    want[tests/test_pitch.py]=1
                    want[tests/test_reaper_golden.py]=1 ;;
                daft_exprt_tpu/inference/*)
                    want[tests/test_cli.py]=1
                    want[tests/test_style_bank.py]=1
                    want[tests/test_serve.py]=1
                    want[tests/test_output_bucketing.py]=1
                    want[tests/test_film_cache.py]=1
                    want[tests/test_inference_mesh.py]=1 ;;
                daft_exprt_tpu/training/*)
                    want[tests/test_train_step.py]=1
                    want[tests/test_pipeline.py]=1
                    want[tests/test_checkpoint.py]=1
                    want[tests/test_loss.py]=1 ;;
                daft_exprt_tpu/models/*|daft_exprt_tpu/ops/*)
                    want[tests/test_model.py]=1
                    want[tests/test_modules.py]=1
                    want[tests/test_torch_parity.py]=1 ;;
                daft_exprt_tpu/vocoder/*)
                    want[tests/test_vocoder.py]=1
                    want[tests/test_vocoder_train.py]=1
                    want[tests/test_streaming_vocoder.py]=1
                    want[tests/test_fused_vocoder.py]=1
                    want[tests/test_mrf_vocoder.py]=1
                    want[tests/test_serve.py]=1 ;;
                daft_exprt_tpu/data/*)
                    want[tests/test_pipeline.py]=1 ;;
                daft_exprt_tpu/parallel/*|daft_exprt_tpu/aot.py)
                    want[tests/test_train_step.py]=1
                    want[tests/test_inference_mesh.py]=1
                    want[tests/test_aot_cache.py]=1 ;;
                scripts/serve.py)  want[tests/test_serve.py]=1 ;;
                scripts/synthesize.py|scripts/evaluation/*)
                    want[tests/test_cli.py]=1
                    want[tests/test_style_bank.py]=1 ;;
                scripts/training.py|scripts/train_vocoder.py)
                    want[tests/test_pipeline.py]=1
                    want[tests/test_vocoder_train.py]=1 ;;
                tools/convert_checkpoint.py|tools/export_acoustic_torch.py)
                    want[tests/test_torch_parity.py]=1
                    want[tests/test_checkpoint.py]=1 ;;
            esac ;;
    esac
done

targets=$(printf '%s\n' "${!want[@]}" | while read -r t; do
              [[ -e "$t" ]] && echo "$t"; done | sort -u)

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
