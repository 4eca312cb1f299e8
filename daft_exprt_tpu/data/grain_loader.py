"""Grain-backed training loader: parallel-worker batch assembly.

The native ``TrainLoader`` assembles each stacked batch inline (one
``prefetch_iterator`` thread overlaps a single batch with the device
step). At ~20 optimizer steps/s on one chip, the .npy reads + collation
for a (accum, B, ...) step batch are a measurable host-side stall risk;
this loader keeps the exact same epoch plan (shuffle, length-sorted
chunks, step-wide buckets, per-process row slicing —
``TrainLoader.plan_epoch``/``assemble``)
but hands step assembly to a pool of Grain worker processes with
read-ahead, so multiple future batches build concurrently.

Batches are bit-identical to the native loader's (tested); select with
``hparams.data_loader = "grain"``. The reference's analog is
``DataLoader(num_workers=8)`` (/root/reference/src/daft_exprt/
train.py:324).
"""

from __future__ import annotations

import numpy as np

from daft_exprt_tpu.data.loader import FeatureDataset, TrainLoader


class _StepSource:
    """Grain RandomAccessDataSource over one epoch's planned steps."""

    def __init__(self, loader: TrainLoader, plan: list):
        self._loader = loader
        self._plan = plan

    def __len__(self) -> int:
        return len(self._plan)

    def __getitem__(self, b: int) -> dict:
        return self._loader.assemble(self._plan[b])


class GrainTrainLoader(TrainLoader):
    """TrainLoader with Grain multi-process step assembly.

    :param worker_count: Grain worker processes (0 = assemble inline,
        still through the Grain pipeline)
    :param read_ahead: batches buffered ahead of the consumer
    """

    def __init__(self, dataset: FeatureDataset, hparams,
                 process_index: int = 0, process_count: int = 1,
                 worker_count: int | None = None, read_ahead: int = 2):
        super().__init__(dataset, hparams, process_index=process_index,
                         process_count=process_count)
        if worker_count is None:
            worker_count = int(getattr(hparams, "data_workers", 4))
        self.worker_count = worker_count
        self.read_ahead = read_ahead

    def epoch(self, epoch_idx: int, start_step: int = 0):
        import grain.python as grain

        plan = self.plan_epoch(epoch_idx)[start_step:]
        if not plan:
            return
        source = _StepSource(self, plan)
        sampler = grain.IndexSampler(
            num_records=len(source),
            shard_options=grain.NoSharding(),  # assemble() slices rows
            shuffle=False,                     # plan is pre-shuffled
            num_epochs=1,
            seed=0,
        )
        loader = grain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[],
            worker_count=self.worker_count,
            read_options=grain.ReadOptions(
                num_threads=1, prefetch_buffer_size=self.read_ahead),
        )
        for batch in loader:
            # grain may hand back shared-memory-backed arrays; they are
            # consumed immediately by device_put, plain ndarray is fine
            yield {k: np.asarray(v) for k, v in batch.items()}
