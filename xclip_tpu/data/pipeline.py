"""Host-side input pipeline: decode → tokenize → batch → prefetch to device.

The reference has no data pipeline at all (SURVEY §1 — users hand-feed
tensors). This is the TPU-native subsystem: a worker pool decodes images and
tokenizes captions (C++ fast-BPE when built) for upcoming batches while the
current one trains, and finished batches are placed on device (optionally
sharded over a mesh's 'data' axis) ahead of use, so host work overlaps
device compute.

Scaling model (docs/SCALING.md has the measured sweep): per-example cost
is dominated by JPEG decode + resize (217 pairs/s/core measured at 256px
via examples/bench_input.py — one worker thread overlapping the pipeline
thread); the pool parallelizes it across `num_workers` threads (PIL and
numpy release the GIL; `worker_backend='process'` for GIL-holding
datasets) and the 3k pairs/s north star needs ~14 host cores (a standard
v5e host VM has 112 vCPUs). Every
stage is per-host: on multihost, each process decodes only ITS shard of the
example stream (disjoint `shard_index::shard_count` slices — no duplicated
data, no cross-host traffic).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import data_sharding
from .tokenizer import SimpleTokenizer


def _is_indexable(source) -> bool:
    return hasattr(source, "__getitem__") and hasattr(source, "__len__")


# process-pool worker state: the dataset is shipped ONCE per worker at pool
# startup (initializer) instead of pickled with every submitted index
_WORKER_DATASET = None


def _process_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_get(i):
    return _WORKER_DATASET[i]


class TextImageLoader:
    """Batches (text, image) examples and prefetches them to device.

    Args:
      examples: either an INDEXABLE dataset (`__len__` + `__getitem__`
        returning a (text, image) pair — e.g. `ImageFolderDataset`), which
        enables the multi-worker pool, per-epoch shuffling, and multihost
        sharding; or any iterable / factory returning an iterable of pairs
        (single-threaded fallback, optionally with a shuffle buffer).
        Text is a string (tokenized here) or a pre-tokenized int sequence;
        image is a (C, H, W) float array.
      batch_size: per-host batch size (global batch when single-host).
      context_length: token width; sequences are padded/truncated to it.
      mesh: optional jax Mesh — batches are sharded over its 'data' axis.
      prefetch: number of device batches to stage ahead.
      drop_remainder: drop the final short batch (keeps shapes static for jit).
      pad_remainder: with drop_remainder=False, pad the final short batch
        up to `batch_size` (repeating the last example) instead of yielding
        a short one, and add a `'valid'` bool array to EVERY yielded batch
        (all-True except on the padded tail) — shapes and the batch pytree
        stay static for jit. Pass it to the loss as `row_valid` so padded
        rows leave the contrastive numerators/denominators: the padded
        step's loss equals the truncated batch's on the real rows
        (reference distributed.py:14-39 variable-batch spirit).
      num_workers: decode/tokenize workers (indexable sources). 0 =
        inline in the pipeline thread.
      worker_backend: 'thread' (default — PIL/numpy release the GIL for
        decode/resize, zero IPC cost) or 'process' — a ProcessPoolExecutor
        for datasets whose __getitem__ holds the GIL (pure-Python decode,
        augmentation): true parallelism at the cost of pickling each
        decoded example back (examples/bench_input.py measures both).
      shuffle_seed: enables shuffling — a fresh deterministic permutation
        per epoch for indexable sources, a `shuffle_buffer`-sized streaming
        shuffle otherwise.
      shuffle_buffer: buffer size for the streaming shuffle (iterables only).
      num_epochs: how many passes over the source (None = repeat forever).
      shard_count/shard_index: partition the example stream across hosts;
        default to `jax.process_count()` / `jax.process_index()`. Every host
        sees a DISJOINT `shard_index::shard_count` slice of each epoch's
        (shuffled) order — the multihost-correctness requirement the
        single-stream design silently violated.
      image_dtype: numpy dtype name for the collated image batch
        ('float32' default for reference parity; 'bfloat16' halves the
        host→device transfer AND removes the in-graph fp32→bf16 ingest
        cast when training with compute_dtype='bfloat16' — the images
        arrive in the dtype the MXU consumes).
      device_put: place each batch on device (default). False yields host
        numpy arrays untouched — for callers composing their own placement
        (custom shardings, double-buffered H2D) or measuring host-side
        throughput in isolation (examples/bench_e2e.py).
      resume_from: a `loader_state` dict (`{'epoch': E, 'batch_index': B}`)
        taken from a previously yielded batch — iteration resumes with the
        batch that FOLLOWED it: epoch E's permutation is re-derived from
        `shuffle_seed ⊕ E` and the first B batches are skipped, so a
        checkpoint-and-restart run consumes exactly the unseen remainder
        of the epoch instead of replaying from (0, 0) (VERDICT r3 §weak-3).
        Indexable sources only — a bare stream cannot seek.

    Every yielded batch dict carries its own `'loader_state'` entry — the
    state to pass as `resume_from` so the NEXT run starts right after that
    batch. Save it with the model checkpoint (`CheckpointManager.save(...,
    loader_state=...)`).
    """

    def __init__(self, examples, batch_size: int, *,
                 context_length: int = 256,
                 tokenizer: Optional[SimpleTokenizer] = None,
                 mesh=None, prefetch: int = 2,
                 drop_remainder: bool = True,
                 pad_remainder: bool = False,
                 num_workers: int = 0,
                 worker_backend: str = "thread",
                 shuffle_seed: Optional[int] = None,
                 shuffle_buffer: int = 4096,
                 num_epochs: Optional[int] = 1,
                 shard_count: Optional[int] = None,
                 shard_index: Optional[int] = None,
                 image_dtype: str = "float32",
                 device_put: bool = True,
                 resume_from: Optional[dict] = None):
        self._examples = examples
        self.batch_size = batch_size
        self.context_length = context_length
        self.tokenizer = tokenizer or SimpleTokenizer()
        self.mesh = mesh
        self.prefetch = max(1, prefetch)
        self.drop_remainder = drop_remainder
        if pad_remainder and drop_remainder:
            raise ValueError("pad_remainder=True requires "
                             "drop_remainder=False (nothing to pad when "
                             "short batches are dropped)")
        self.pad_remainder = pad_remainder
        self.num_workers = num_workers
        if worker_backend not in ("thread", "process"):
            raise ValueError(f"unknown worker_backend: {worker_backend!r} "
                             "(expected 'thread' or 'process')")
        self.worker_backend = worker_backend
        self.shuffle_seed = shuffle_seed
        self.shuffle_buffer = shuffle_buffer
        self.num_epochs = num_epochs
        self.shard_count = (shard_count if shard_count is not None
                            else jax.process_count())
        self.shard_index = (shard_index if shard_index is not None
                            else jax.process_index())
        assert 0 <= self.shard_index < self.shard_count
        # jnp.dtype resolves 'bfloat16' (ml_dtypes) alongside numpy names
        self._image_dtype = jnp.dtype(image_dtype)
        self.device_put = device_put

        if resume_from is not None:
            if not _is_indexable(examples):
                raise ValueError(
                    "resume_from requires an indexable dataset: a bare "
                    "stream cannot seek to a (epoch, batch_index) position")
            self._start_epoch = int(resume_from["epoch"])
            self._start_batch = int(resume_from["batch_index"])
        else:
            self._start_epoch = 0
            self._start_batch = 0

        # fail at construction, not an epoch into training: an indexable
        # source whose per-host shard cannot fill one batch (or is empty
        # outright) would yield ZERO batches per epoch — with
        # num_epochs=None the producer thread would silently spin through
        # empty epochs forever
        if _is_indexable(examples):
            per_shard = len(examples) // self.shard_count
            if per_shard == 0:
                raise ValueError(
                    f"dataset of {len(examples)} examples across "
                    f"{self.shard_count} shards leaves this shard empty — "
                    "every epoch would yield zero batches. Use a dataset "
                    "with at least one example per shard.")
            if self.drop_remainder and per_shard < batch_size:
                raise ValueError(
                    f"dataset of {len(examples)} examples gives "
                    f"{per_shard} per shard ({self.shard_count} shards) — "
                    f"fewer than batch_size={batch_size} with "
                    "drop_remainder=True, so every epoch would be empty. "
                    "Lower batch_size or pass drop_remainder=False.")

        # the streamed (non-indexable) path can neither shard the example
        # stream across processes nor replay a bare iterator for further
        # epochs
        if not _is_indexable(examples):
            if self.shard_count > 1:
                raise ValueError(
                    "shard_count > 1 requires an indexable dataset "
                    "(__len__ + __getitem__, e.g. ImageFolderDataset): a "
                    "bare iterable cannot be partitioned across processes, "
                    "and silently duplicating the stream on every host is "
                    "exactly the multihost bug this parameter prevents")
            if num_epochs != 1 and not callable(examples):
                raise ValueError(
                    "multi-epoch iteration needs an indexable dataset or a "
                    "factory callable returning a fresh iterator; a bare "
                    "iterator cannot be replayed")

    # ------------------------------------------------------------- collate
    def _collate(self, texts, images) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(texts[0], str):
            tokens = self.tokenizer.tokenize(
                list(texts), context_length=self.context_length,
                truncate_text=True, pad_to_context_length=True)
        else:
            tokens = np.zeros((len(texts), self.context_length), dtype=np.int32)
            for i, t in enumerate(texts):
                t = np.asarray(t, dtype=np.int32)[: self.context_length]
                tokens[i, : len(t)] = t
        # decode/resize in fp32, quantize once at the batch boundary (a
        # per-example bf16 asarray would round twice through PIL paths).
        # Write each example straight into one preallocated batch buffer:
        # the assignment fuses the dtype cast with the copy in a single
        # pass, and avoids np.stack's expanded-view concatenate + the
        # separate astype, each of which allocates another full batch
        # (measured on the 1-core build VM: np.stack of 256 fp32 images
        # took 1.8-6.8 s/batch vs ~0.1 s for this loop — large fresh
        # allocations page-fault at a fraction of memcpy speed there, and
        # one output allocation is the floor any collate needs)
        # (asarray keeps the fp32-first rounding semantics for non-fp32
        # sources and is a no-copy view for the common fp32 dataset output)
        first = np.asarray(images[0], dtype=np.float32)
        out = np.empty((len(images),) + first.shape, dtype=self._image_dtype)
        out[0] = first
        for i, im in enumerate(images[1:], start=1):
            out[i] = np.asarray(im, dtype=np.float32)
        return tokens, out

    # ------------------------------------------- indexable (pooled) source
    def _epoch_indices(self, n: int, epoch: int) -> np.ndarray:
        order = np.arange(n)
        if self.shuffle_seed is not None:
            # same global permutation on every host (seed ⊕ epoch), then a
            # disjoint strided slice per host
            np.random.RandomState(self.shuffle_seed + epoch).shuffle(order)
        shard = order[self.shard_index::self.shard_count]
        # every shard must be the SAME length (SPMD lockstep: a host with
        # one extra example could emit one extra batch and deadlock the
        # collective-running hosts) — truncate to the shortest shard
        return shard[: n // self.shard_count]

    def _indexed_batches(self, pool) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (tokens, images, loader_state): the state names the NEXT
        position, so resuming from it replays nothing and skips nothing —
        each epoch's order is a pure function of `shuffle_seed ⊕ epoch`
        (`_epoch_indices`), making the skip exact, not approximate."""
        src = self._examples
        n = len(src)
        epoch = self._start_epoch
        while self.num_epochs is None or epoch < self.num_epochs:
            order = self._epoch_indices(n, epoch)
            usable = len(order)
            if self.drop_remainder:
                usable -= usable % self.batch_size
            skip = self._start_batch if epoch == self._start_epoch else 0
            for bi, start in enumerate(
                    range(skip * self.batch_size, usable, self.batch_size),
                    start=skip):
                idx = order[start:start + self.batch_size]
                if len(idx) < self.batch_size and self.drop_remainder:
                    break
                if isinstance(pool, ProcessPoolExecutor):
                    pairs = list(pool.map(_process_worker_get, idx))
                elif pool is not None:
                    pairs = list(pool.map(src.__getitem__, idx))
                else:
                    pairs = [src[i] for i in idx]
                texts, images = zip(*pairs)
                tokens, images_np = self._collate(list(texts), list(images))
                yield tokens, images_np, {"epoch": epoch, "batch_index": bi + 1}
            epoch += 1
            # a resume position past the epoch's end rolls into the next
            # epoch naturally (skip only applies to the resumed epoch)

    # --------------------------------------------- iterable (fallback) path
    def _iter_examples(self) -> Iterator:
        epoch = 0
        while self.num_epochs is None or epoch < self.num_epochs:
            ex = self._examples
            it = iter(ex() if callable(ex) else ex)
            if self.shuffle_seed is not None:
                it = self._buffered_shuffle(it, epoch)
            yield from it
            epoch += 1

    def _buffered_shuffle(self, it, epoch: int):
        rs = np.random.RandomState(self.shuffle_seed + epoch)
        buf = []
        for item in it:
            if len(buf) < self.shuffle_buffer:
                buf.append(item)
                continue
            j = rs.randint(len(buf))
            out, buf[j] = buf[j], item
            yield out
        rs.shuffle(buf)
        yield from buf

    def _streamed_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        texts, images = [], []
        for text, image in self._iter_examples():
            texts.append(text)
            images.append(image)
            if len(texts) == self.batch_size:
                yield (*self._collate(texts, images), None)
                texts, images = [], []
        if texts and not self.drop_remainder:
            yield (*self._collate(texts, images), None)

    def _host_batches(self, pool) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if _is_indexable(self._examples):
            return self._indexed_batches(pool)
        return self._streamed_batches()

    # ---------------------------------------------------------------- iter
    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        err: list = []

        multihost = jax.process_count() > 1

        def place(arr):
            if not self.device_put:
                return arr
            if self.mesh is None:
                return jax.device_put(arr)
            sharding = data_sharding(self.mesh, arr.ndim)
            if multihost:
                # each host feeds its own shard of the global batch; the
                # global array is assembled without cross-host transfers
                # (batch_size is then the PER-HOST batch)
                return jax.make_array_from_process_local_data(sharding, arr)
            return jax.device_put(arr, sharding)

        pool = None
        if self.num_workers > 0 and _is_indexable(self._examples):
            if self.worker_backend == "process":
                # spawn, not fork: JAX's runtime is multithreaded and a
                # fork()ed child can deadlock on its inherited locks (the
                # interpreter itself warns). Spawn pays a one-time worker
                # startup; the dataset ships once via the initializer.
                import multiprocessing
                pool = ProcessPoolExecutor(
                    self.num_workers, initializer=_process_worker_init,
                    initargs=(self._examples,),
                    mp_context=multiprocessing.get_context("spawn"))
            else:
                pool = ThreadPoolExecutor(self.num_workers)

        # consumer-gone signal: when the caller abandons the iterator early
        # (e.g. a bounded training loop over num_epochs=None), the producer
        # must not stay blocked on q.put forever pinning `prefetch` device
        # batches — it checks this event between put attempts and exits
        done = threading.Event()

        def put_until_done(item) -> bool:
            while not done.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for tokens, images, loader_state in self._host_batches(pool):
                    batch = {"loader_state": loader_state}
                    if self.pad_remainder:
                        real = tokens.shape[0]
                        if real < self.batch_size:
                            reps = self.batch_size - real
                            tokens = np.concatenate(
                                [tokens, np.repeat(tokens[-1:], reps, 0)], 0)
                            images = np.concatenate(
                                [images, np.repeat(images[-1:], reps, 0)], 0)
                        batch["valid"] = place(
                            np.arange(self.batch_size) < real)
                    batch["text"] = place(tokens)
                    batch["image"] = place(images)
                    if not put_until_done(batch):
                        return
            except Exception as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                put_until_done(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            done.set()
            if pool is not None:
                pool.shutdown(wait=False)
