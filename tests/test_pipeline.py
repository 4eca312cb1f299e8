"""End-to-end data pipeline test on a self-built synthetic corpus.

Builds wavs + metadata + MFA-style TextGrids from scratch, then runs:
markers extraction -> feature extraction (batched device mel) ->
set creation -> stats -> data loader, checking the reference's
invariants at every stage (SURVEY.md section 4).
"""

import os

import numpy as np
import pytest

from helpers import tiny_hparams

from daft_exprt_tpu.audio.io import save_wav
from daft_exprt_tpu.data.features import (extract_features,
                                          extract_features_for_file)
from daft_exprt_tpu.data.loader import (EvalLoader, FeatureDataset,
                                        TrainLoader, collate)
from daft_exprt_tpu.data.mfa import extract_markers
from daft_exprt_tpu.data.sets import create_sets
from daft_exprt_tpu.data.stats import extract_features_stats

FS = 22050

_PHONES = ["HH", "AH0", "L", "OW1", "W", "ER1", "D", "S", "IY1", "T"]
_WORDS = [("hello", ["HH", "AH0", "L", "OW1"]),
          ("world", ["W", "ER1", "L", "D"]),
          ("sweet", ["S", "W", "IY1", "T"])]


def _write_textgrid(path, words):
    """words: [(word, [(phone, dur_sec), ...]), ...] with leading/
    trailing silence added here."""
    items = []
    t = 0.0
    word_rows, phone_rows = [], []
    # leading silence
    word_rows.append((t, t + 0.3, ""))
    phone_rows.append((t, t + 0.3, "sil"))
    t += 0.3
    for word, phones in words:
        w_start = t
        for phone, dur in phones:
            phone_rows.append((t, t + dur, phone))
            t += dur
        word_rows.append((w_start, t, word))
    word_rows.append((t, t + 0.3, ""))
    phone_rows.append((t, t + 0.3, ""))
    t += 0.3

    def tier(name, rows):
        out = [f'        class = "IntervalTier"\n',
               f'        name = "{name}"\n',
               f"        xmin = 0\n        xmax = {t}\n",
               f"        intervals: size = {len(rows)}\n"]
        for i, (a, b, s) in enumerate(rows, 1):
            out.append(f"        intervals [{i}]:\n"
                       f"            xmin = {a}\n            xmax = {b}\n"
                       f'            text = "{s}"\n')
        return "".join(out)

    with open(path, "w") as f:
        f.write('File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
                f"xmin = 0\nxmax = {t}\ntiers? <exists>\nsize = 2\n"
                "item []:\n    item [1]:\n")
        f.write(tier("words", word_rows))
        f.write("    item [2]:\n")
        f.write(tier("phones", phone_rows))
    return t


def _build_corpus(root, speakers, rng):
    dataset_dir = os.path.join(root, "dataset")
    features_dir = os.path.join(root, "features")
    for spk in speakers:
        wavs = os.path.join(dataset_dir, spk, "wavs")
        align = os.path.join(dataset_dir, spk, "align")
        os.makedirs(wavs, exist_ok=True)
        os.makedirs(align, exist_ok=True)
        os.makedirs(os.path.join(features_dir, spk), exist_ok=True)
        meta_lines = []
        for i in range(3):
            name = f"{spk}_utt{i}"
            words = []
            text = []
            for w, phones in _WORDS[:2 + i % 2]:
                durs = [(p, 0.12 + 0.03 * rng.random()) for p in phones]
                words.append((w, durs))
                text.append(w)
            total = _write_textgrid(os.path.join(align, f"{name}.TextGrid"),
                                    words)
            # audio: harmonic tone (voiced) spanning the whole file
            t = np.arange(int(total * FS)) / FS
            f0 = 160 + 30 * np.sin(2 * np.pi * 1.5 * t)
            phase = 2 * np.pi * np.cumsum(f0) / FS
            wav = (0.5 * np.sin(phase) + 0.2 * np.sin(2 * phase)
                   ).astype(np.float32)
            save_wav(os.path.join(wavs, f"{name}.wav"), wav, FS)
            sentence = " ".join(text)
            meta_lines.append(f"{name}|{sentence}\n")
            with open(os.path.join(align, f"{name}.lab"), "w") as f:
                f.write(sentence)
        for d in (os.path.join(dataset_dir, spk),
                  os.path.join(features_dir, spk)):
            with open(os.path.join(d, "metadata.csv"), "w") as f:
                f.writelines(meta_lines)
    return dataset_dir, features_dir


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    rng = np.random.default_rng(0)
    hp = tiny_hparams(
        output_directory=os.path.join(root, "exp"),
        training_files=os.path.join(root, "exp", "train.txt"),
        validation_files=os.path.join(root, "exp", "val.txt"),
        speakers=["spk_a", "spk_b"],
    )
    dataset_dir, features_dir = _build_corpus(root, hp.speakers, rng)
    return root, hp, dataset_dir, features_dir


def test_full_pipeline(corpus):
    root, hp, dataset_dir, features_dir = corpus

    # 1. markers from TextGrids
    for spk in hp.speakers:
        align = os.path.join(dataset_dir, spk, "align")
        extract_markers(align, n_jobs=2)
        markers = [x for x in os.listdir(align) if x.endswith(".markers")]
        assert len(markers) == 3

    # 2. features (pool + batched device mel)
    extract_features(dataset_dir, features_dir, hp, n_jobs=2,
                     device_batch=4)
    for spk in hp.speakers:
        d = os.path.join(features_dir, spk)
        npys = [x for x in os.listdir(d) if x.endswith(".npy")]
        assert len(npys) == 3, os.listdir(d)
        assert os.path.isfile(os.path.join(d, "config.json"))

    # batched mel == per-file mel (bit-exact batching claim)
    spk = hp.speakers[0]
    d = os.path.join(features_dir, spk)
    name = sorted(x for x in os.listdir(d) if x.endswith(".npy"))[0]
    base = name[:-len(".npy")]
    batched_mel = np.load(os.path.join(d, name))
    import shutil
    single_dir = os.path.join(root, "single")
    out = extract_features_for_file(
        os.path.join(dataset_dir, spk, "align", f"{base}.markers"),
        os.path.join(dataset_dir, spk, "wavs", f"{base}.wav"),
        single_dir, hp)
    assert out == base
    single_mel = np.load(os.path.join(single_dir, name))
    np.testing.assert_allclose(batched_mel, single_mel, atol=2e-5)

    # markers invariants: int durations sum to mel frames
    with open(os.path.join(d, f"{base}.markers")) as f:
        rows = [line.split("\t") for line in f]
    assert sum(int(r[2]) for r in rows) == batched_mel.shape[1]

    # 3. sets (guarantee >= 1 validation file per speaker)
    create_sets(features_dir, hp, proportion_validation=0.1)
    with open(hp.validation_files) as f:
        val_lines = [x.strip().split("|") for x in f if x.strip()]
    assert {int(x[2]) for x in val_lines} == set(hp.speakers_id)

    # 4. stats
    stats = extract_features_stats(hp, n_jobs=2)
    for sid in hp.speakers_id:
        assert stats[f"spk {sid}"]["pitch"]["std"] >= 0
        assert stats[f"spk {sid}"]["energy"]["mean"] > 0
    assert "symbols" in stats and "HH" in stats["symbols"]
    hp.stats = stats

    # 5. loader
    ds = FeatureDataset(hp.training_files, hp)
    ex = ds[0]
    assert int(ex["durations_int"].sum()) == ex["mel_spec"].shape[1]
    batch = collate([ds[i] for i in range(min(2, len(ds)))], hp)
    assert batch["symbols"].shape[1] % hp.symbol_bucket == 0
    assert batch["mel_specs"].shape[2] % hp.frame_bucket == 0

    hp.batch_size, hp.accumulation_steps = 2, 2
    tl = TrainLoader(ds, hp)
    assert tl.n_dropped == 0
    batches = list(tl.epoch(0))
    if batches:  # 4 train items / (2*2) = 1 step
        b = batches[0]
        assert b["symbols"].shape[:2] == (2, 2)
    ev = list(EvalLoader(FeatureDataset(hp.validation_files, hp,
                                        shuffle=False), hp))
    assert len(ev) >= 1


def test_grain_loader_matches_native(corpus):
    """GrainTrainLoader yields bit-identical batches to TrainLoader,
    inline (worker_count=0) and with worker processes."""
    root, hp, dataset_dir, features_dir = corpus
    from daft_exprt_tpu.data.grain_loader import GrainTrainLoader
    hp.batch_size, hp.accumulation_steps = 2, 2
    ds = FeatureDataset(hp.training_files, hp)
    native = TrainLoader(ds, hp)
    for wc in (0, 2):
        g = GrainTrainLoader(ds, hp, worker_count=wc)
        nb = list(native.epoch(3))
        gb = list(g.epoch(3))
        assert len(gb) == len(nb) >= 1
        for a, b in zip(nb, gb):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], np.asarray(b[k]))


def test_trainer_end_to_end(corpus):
    """Two optimizer steps + checkpoint + resume on the tiny corpus."""
    import jax
    from daft_exprt_tpu.data.stats import extract_features_stats
    from daft_exprt_tpu.training.checkpoint import load_checkpoint
    from daft_exprt_tpu.training.trainer import Trainer

    root, hp, dataset_dir, features_dir = corpus
    if not os.path.isfile(hp.training_files):  # run after pipeline test
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)
        create_sets(features_dir, hp, proportion_validation=0.1)
    if not hp.stats:
        hp.stats = extract_features_stats(hp, n_jobs=2)

    hp.batch_size = 2
    hp.accumulation_steps = 1
    hp.iters_per_checkpoint = 2
    hp.iters_check_for_model_improvement = 2
    hp.dp_size = 2  # 2-device data parallel on the virtual CPU mesh

    hooks = []
    trainer = Trainer(hp, log_every=1)
    params, opt_state = trainer.train(
        benchmark_hook=lambda p, it, out: hooks.append(it),
        max_iterations=2)
    assert trainer.iteration == 2
    assert hooks == [2]

    ckpt = os.path.join(str(hp.output_directory), "checkpoints",
                        "DaftExprt_2")
    assert os.path.isdir(ckpt)
    restored, _, meta = load_checkpoint(ckpt, hparams=hp)
    assert meta["iteration"] == 2
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # resume continues from the checkpoint
    hp.checkpoint = ckpt
    trainer2 = Trainer(hp, log_every=1)
    trainer2.train(max_iterations=3)
    assert trainer2.iteration == 3


def test_mid_epoch_resume_skips_consumed_steps(corpus):
    """epoch(e, start_step=k) yields exactly the batches after the
    k-th planned step -- a resumed run continues the interrupted
    epoch instead of replaying it."""
    from daft_exprt_tpu.data.loader import FeatureDataset, TrainLoader
    from daft_exprt_tpu.data.stats import extract_features_stats

    root, hp, dataset_dir, features_dir = corpus
    if not os.path.isfile(hp.training_files):  # run after pipeline test
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)
        create_sets(features_dir, hp, proportion_validation=0.1)
    if not hp.stats:
        hp.stats = extract_features_stats(hp, n_jobs=2)

    hp.batch_size = 2
    hp.accumulation_steps = 1
    loader = TrainLoader(FeatureDataset(hp.training_files, hp), hp)
    n_steps = loader.batches_per_epoch()
    assert n_steps >= 2
    full = list(loader.epoch(3))
    resumed = list(loader.epoch(3, start_step=1))
    assert len(resumed) == len(full) - 1
    for a, b in zip(full[1:], resumed):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_preemption_sigterm_checkpoints_and_exits(corpus):
    """SIGTERM mid-training (the Cloud TPU preemption notice) makes the
    loop exit at the next step boundary with a DaftExprt_last
    checkpoint at the reached iteration (beyond-parity: the reference
    has no preemption handling, SURVEY §5)."""
    import signal

    from daft_exprt_tpu.data.stats import extract_features_stats
    from daft_exprt_tpu.training.checkpoint import load_checkpoint
    from daft_exprt_tpu.training.trainer import Trainer

    root, hp, dataset_dir, features_dir = corpus
    if not os.path.isfile(hp.training_files):  # run after pipeline test
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)
        create_sets(features_dir, hp, proportion_validation=0.1)
    if not hp.stats:
        hp.stats = extract_features_stats(hp, n_jobs=2)

    hp.batch_size = 2
    hp.accumulation_steps = 1
    hp.iters_per_checkpoint = 2
    hp.iters_check_for_model_improvement = 10_000
    hp.dp_size = 2
    hp.checkpoint = ""
    hp.output_directory = os.path.join(root, "train_preempt")

    trainer = Trainer(hp, log_every=1)
    prev = signal.signal(signal.SIGTERM,
                         lambda signum, frame: trainer.request_stop())
    try:
        # deliver a real SIGTERM from the checkpoint hook at iteration 2
        def hook(params, iteration, out_dir):
            os.kill(os.getpid(), signal.SIGTERM)

        trainer.train(benchmark_hook=hook, max_iterations=50)
    finally:
        signal.signal(signal.SIGTERM, prev)

    assert trainer.iteration == 2, "loop must stop at the step boundary"
    last = os.path.join(str(hp.output_directory), "checkpoints",
                        "DaftExprt_last")
    _, _, meta = load_checkpoint(last)
    assert meta["iteration"] == 2


def test_validate_small_val_set_on_mesh(corpus):
    """Regression (round-1 VERDICT): with fewer validation rows than
    mesh devices, validate() must still evaluate every sample (padded +
    masked), return non-empty metrics, and let best-checkpoint fire —
    not silently skip the whole set."""
    import jax
    from daft_exprt_tpu.data.stats import extract_features_stats
    from daft_exprt_tpu.training.trainer import Trainer

    root, hp, dataset_dir, features_dir = corpus
    if not os.path.isfile(hp.training_files):  # run after pipeline test
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)
        create_sets(features_dir, hp, proportion_validation=0.1)
    if not hp.stats:
        hp.stats = extract_features_stats(hp, n_jobs=2)

    hp.batch_size = 8
    hp.accumulation_steps = 1
    hp.dp_size = 8  # full virtual CPU mesh; val set is only 2 files
    trainer = Trainer(hp, log_every=1)
    params, _ = trainer.init_state()
    _, val_loader = trainer.make_loaders()
    n_val = sum(1 for _ in open(hp.validation_files) if _.strip())
    assert 0 < n_val < 8  # the failure precondition: rows < devices
    val = trainer.validate(params, val_loader)
    assert val and np.isfinite(val["loss"])
    # best-model tracking sees a real loss, so it fires
    assert val.get("loss", float("inf")) < trainer.best_val_loss


def test_fine_tuning_dataset(corpus):
    """Teacher-forced vocoder dataset: mel .npy + trimmed GT wav per
    utterance, predicted mel shape == GT mel shape (reference
    fine_tune.py:102-104 invariant)."""
    import jax
    from daft_exprt_tpu.data.stats import extract_features_stats
    from daft_exprt_tpu.inference.fine_tune import fine_tuning_dataset
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    root, hp, dataset_dir, features_dir = corpus
    if not os.path.isfile(hp.training_files):  # run after pipeline test
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)
        create_sets(features_dir, hp, proportion_validation=0.1)
    if not hp.stats:
        hp.stats = extract_features_stats(hp, n_jobs=2)

    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    out_dir = os.path.join(root, "fine_tuning_dataset")
    fine_tuning_dataset(model, params, hp, dataset_dir, out_dir,
                        batch_size=2)

    with open(hp.training_files) as f:
        n_train = sum(1 for line in f if line.strip())
    produced = []
    for spk in hp.speakers:
        d = os.path.join(out_dir, spk)
        if not os.path.isdir(d):
            continue
        for x in os.listdir(d):
            if x.endswith(".npy"):
                base = x[:-4]
                assert os.path.isfile(os.path.join(d, base + ".wav"))
                mel = np.load(os.path.join(d, x))
                gt = np.load(os.path.join(features_dir, spk, x))
                assert mel.shape == gt.shape
                produced.append(base)
    assert len(produced) == n_train, (len(produced), n_train)


def test_device_pitch_features_match_host(corpus):
    """extract_features(device_pitch=True) writes byte-identical F0
    features: the batched JAX tracker + exact hold/quantization chain
    reproduces the host worker-pool path."""
    root, hp, dataset_dir, features_dir = corpus
    host_dir = os.path.join(features_dir, hp.speakers[0])
    if not any(x.endswith(".frames_f0") for x in os.listdir(host_dir)):
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)

    dev_features = os.path.join(root, "features_device_pitch")
    for spk in hp.speakers:
        os.makedirs(os.path.join(dev_features, spk), exist_ok=True)
        import shutil
        shutil.copy(os.path.join(features_dir, spk, "metadata.csv"),
                    os.path.join(dev_features, spk, "metadata.csv"))
    extract_features(dataset_dir, dev_features, hp, n_jobs=2,
                     device_pitch=True)

    compared = 0
    for spk in hp.speakers:
        d_host = os.path.join(features_dir, spk)
        d_dev = os.path.join(dev_features, spk)
        for x in sorted(os.listdir(d_host)):
            if not (x.endswith(".frames_f0") or x.endswith(".symbols_f0")):
                continue
            with open(os.path.join(d_host, x)) as f:
                host_vals = f.read()
            with open(os.path.join(d_dev, x)) as f:
                dev_vals = f.read()
            assert host_vals == dev_vals, x
            compared += 1
    assert compared >= 6 * 2  # 3 utts x 2 files x 2 speakers


def test_train_loader_multiprocess_parity(corpus):
    """Multi-host semantics: every process plans the SAME steps (same
    count, same (L, T) buckets) and per-process batches concatenated
    along the micro-batch axis reproduce the single-process batch."""
    root, hp, dataset_dir, features_dir = corpus
    hp.batch_size, hp.accumulation_steps = 2, 2
    ds = FeatureDataset(hp.training_files, hp)
    single = TrainLoader(ds, hp)
    p0 = TrainLoader(ds, hp, process_index=0, process_count=2)
    p1 = TrainLoader(ds, hp, process_index=1, process_count=2)

    assert single.batches_per_epoch() == p0.batches_per_epoch() \
        == p1.batches_per_epoch() >= 1
    plan_s, plan_0, plan_1 = (ld.plan_epoch(1)
                              for ld in (single, p0, p1))
    assert plan_0 == plan_1 == plan_s  # identical global plans

    for step in plan_s:
        full = single.assemble(step)
        a = p0.assemble(step)
        b = p1.assemble(step)
        for k in full:
            merged = np.concatenate([a[k], b[k]], axis=1)
            np.testing.assert_array_equal(merged, full[k])

    # batch_size must divide process_count
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        TrainLoader(ds, hp, process_index=0, process_count=3)


def test_benchmark_hook_reuses_engine(corpus, tmp_path):
    """The checkpoint benchmark hook builds its InferenceEngine ONCE
    and swaps weights on later checkpoints (a fresh engine per
    checkpoint re-paid every XLA compile while the chief host stalled),
    and actually writes mel previews."""
    from daft_exprt_tpu.inference.benchmark import make_benchmark_hook
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    root, hp, dataset_dir, features_dir = corpus
    if not os.path.isfile(hp.training_files):  # run after pipeline test
        for spk in hp.speakers:
            extract_markers(os.path.join(dataset_dir, spk, "align"),
                            n_jobs=2)
        extract_features(dataset_dir, features_dir, hp, n_jobs=2)
        create_sets(features_dir, hp, proportion_validation=0.1)
    if not hp.stats:
        hp.stats = extract_features_stats(hp, n_jobs=2)

    scripts_root = str(tmp_path / "scripts")
    bench_dir = os.path.join(scripts_root, "benchmarks", hp.language)
    os.makedirs(bench_dir)
    with open(os.path.join(bench_dir, "sentences.txt"), "w") as f:
        f.write("{HH AH0 L OW1} {W ER1 L D}\n{G UH1 D} {D EY1}\n")

    hook = make_benchmark_hook(hp, scripts_root)
    assert hook is not None

    import jax
    model = DaftExprt(hp)
    params1 = model.init_params(jax.random.PRNGKey(0))
    params2 = model.init_params(jax.random.PRNGKey(1))
    out = str(tmp_path / "exp_out")

    hook(params1, 1, out)
    engine1 = hook._state.get("engine")
    assert engine1 is not None, "hook must not have swallowed a failure"
    first = os.path.join(out, "benchmark", "iter_1")
    # generated previews only (the style reference ref_*.npz is also
    # written there and is identical across checkpoints)
    mels = sorted(f for f in os.listdir(first)
                  if f.endswith(".npz") and not f.startswith("ref_"))
    assert mels, os.listdir(first)

    hook(params2, 2, out)
    assert hook._state["engine"] is engine1  # reused, not rebuilt
    second = os.path.join(out, "benchmark", "iter_2")
    assert [f for f in os.listdir(second)
            if f.endswith(".npz") and not f.startswith("ref_")]
    # new weights really took effect: previews differ between ckpts
    # (different weights -> different predicted durations/mels)
    a = np.load(os.path.join(first, mels[0]))
    b = np.load(os.path.join(second, mels[0]))
    key = [k for k in a.files if "mel" in k][0]
    assert a[key].shape != b[key].shape \
        or not np.allclose(a[key], b[key])
