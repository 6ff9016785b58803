"""Dataset/loader factories (SURVEY.md §2.4: ``codes/data/__init__.py`` ::
create_dataset / create_dataloader contract)."""

from __future__ import annotations

import queue
import threading

import numpy as np

from esr_tpu.data.lrhr_dataset import LRDataset, LRHRDataset, SyntheticDataset
from esr_tpu.data.pipeline import draw_z, make_train_pipeline

__all__ = [
    "create_dataset",
    "create_dataloader",
    "collate_samples",
    "LRHRDataset",
    "LRDataset",
    "SyntheticDataset",
    "make_train_pipeline",
    "draw_z",
]


def create_dataset(dataset_opt: dict):
    mode = (dataset_opt.get("mode") or "LRHR").upper()
    if mode in ("LRHR", "LRHR_LMDB"):
        root = str(dataset_opt.get("dataroot_HR") or "")
        if mode == "LRHR_LMDB" or root.endswith(".lmdb"):
            raise NotImplementedError(
                "LMDB backend is unavailable in this environment (no lmdb "
                "module); use mode='PACKED' (esr_tpu.scripts.create_packed_dataset) "
                "for the same fast-random-access workflow"
            )
        return LRHRDataset(dataset_opt)
    if mode == "LR":
        return LRDataset(dataset_opt)
    if mode == "SYNTHETIC":
        return SyntheticDataset(dataset_opt)
    if mode == "PACKED":
        from esr_tpu.data.packed import PackedDataset

        return PackedDataset(dataset_opt)
    raise NotImplementedError(f"dataset mode {mode} not recognized")


def collate_samples(samples, collate_keys=("LR", "HR")) -> dict:
    """Stack per-sample dicts into a batch dict: array keys in
    ``collate_keys`` are np.stack'ed (None if any sample lacks them),
    everything else (paths, metadata) becomes a list."""
    batch = {}
    for key in collate_keys:
        vals = [s.get(key) for s in samples]
        batch[key] = None if any(v is None for v in vals) else np.stack(vals)
    for key in samples[0]:
        if key not in collate_keys:
            batch[key] = [s[key] for s in samples]
    return batch


class DataLoader:
    """Minimal epoch-batched loader with background prefetch.

    The reference leans on torch DataLoader worker subprocesses for its heavy
    host-side preprocessing; here the heavy work runs on-device
    (esr_tpu.data.pipeline), so a single prefetch thread that decodes and
    crops uint8 is enough to keep the TPU fed.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 16,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: int = 0,
        collate_keys=("LR", "HR"),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.collate_keys = collate_keys
        self._epoch = 0
        self._skip = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, samples):
        return collate_samples(samples, self.collate_keys)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx

    def set_position(self, epoch: int, batches_consumed: int = 0) -> None:
        """Restore the data stream for resume: the next ``__iter__`` shuffles
        with epoch ``epoch``'s seed and starts ``batches_consumed`` batches
        into it (composes with the datasets' stateless (seed, epoch, index)
        crop draws — a resumed run sees exactly the batches the original
        would have)."""
        self._epoch = int(epoch)
        self._skip = max(0, int(batches_consumed))

    def __iter__(self):
        # stateless crop/augment draws need the dataset to know the epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        idx = self._indices()
        self._epoch += 1
        first, self._skip = min(self._skip, len(self)), 0
        bs = self.batch_size
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()  # set when the consumer abandons the iter

        def put(item) -> bool:  # False = consumer gone, worker should exit
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in range(first, n_batches):
                    chunk = idx[b * bs : (b + 1) * bs]
                    if not put(self._collate([self.dataset[int(i)] for i in chunk])):
                        return
            except Exception as e:  # surface loader errors in the main thread
                if not put(e):
                    return
            put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # a break/abandoned generator must not leave the worker blocked
            # on a full queue forever (thread leak, mmap/file handles pinned)
            stop.set()


def create_dataloader(dataset, dataset_opt: dict):
    phase = dataset_opt.get("phase", "test")
    if phase == "train":
        return DataLoader(
            dataset,
            batch_size=int(dataset_opt.get("batch_size") or 16),
            shuffle=bool(dataset_opt.get("use_shuffle", True)),
            drop_last=True,
            seed=int(dataset_opt.get("seed") or 0),
        )
    return DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False)


def create_grain_loader(dataset, dataset_opt: dict, collate_keys=("LR", "HR")):
    """Optional grain-based loader (SURVEY.md §7.6: grain is the idiomatic
    host-side loader). Yields the SAME collated batch dicts as DataLoader —
    grain shuffles and (optionally) fans decode out over ``n_workers``
    subprocesses, and collation happens here via :func:`collate_samples`
    (sample dicts carry None LRs and path strings, which grain.Batch would
    np-stack into object arrays). One epoch per iteration, drop_last.
    Raises ImportError when grain is unavailable."""
    import grain.python as grain

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            return dataset[int(idx)]

    batch_size = int(dataset_opt.get("batch_size") or 16)
    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=bool(dataset_opt.get("use_shuffle", True)),
        seed=int(dataset_opt.get("seed") or 0),
        num_epochs=1,
        shard_options=grain.NoSharding(),
    )
    loader = grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        worker_count=int(dataset_opt.get("n_workers") or 0),
    )

    def batches():
        buf = []
        for sample in loader:
            buf.append(sample)
            if len(buf) == batch_size:
                yield collate_samples(buf, collate_keys)
                buf = []

    return batches()
