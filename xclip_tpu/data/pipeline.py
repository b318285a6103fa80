"""Host-side input pipeline: tokenize → batch → prefetch to device.

The reference has no data pipeline at all (SURVEY §1 — users hand-feed
tensors). This is the TPU-native subsystem: a background thread tokenizes
(C++ fast-BPE when built) and collates the next batch while the current one
trains, and batches are placed on device (optionally sharded over a mesh's
'data' axis) ahead of use, so host work overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

from ..parallel.mesh import data_sharding
from .tokenizer import SimpleTokenizer


class TextImageLoader:
    """Batches (text, image) examples and prefetches them to device.

    Args:
      examples: iterable (or factory returning an iterable, for re-iteration)
        of (text, image) pairs — text is a string (tokenized here) or a
        pre-tokenized int sequence; image is a (C, H, W) float array.
      batch_size: per-host batch size (global batch when single-host).
      context_length: token width; sequences are padded/truncated to it.
      mesh: optional jax Mesh — batches are sharded over its 'data' axis.
      prefetch: number of device batches to stage ahead.
      drop_remainder: drop the final short batch (keeps shapes static for jit).
    """

    def __init__(self, examples, batch_size: int, *,
                 context_length: int = 256,
                 tokenizer: Optional[SimpleTokenizer] = None,
                 mesh=None, prefetch: int = 2,
                 drop_remainder: bool = True):
        self._examples = examples
        self.batch_size = batch_size
        self.context_length = context_length
        self.tokenizer = tokenizer or SimpleTokenizer()
        self.mesh = mesh
        self.prefetch = max(1, prefetch)
        self.drop_remainder = drop_remainder

    def _example_iter(self) -> Iterator:
        ex = self._examples
        return iter(ex() if callable(ex) else ex)

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
        images = np.stack([np.asarray(im, dtype=np.float32) for im in images])
        return tokens, images

    def _host_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        texts, images = [], []
        for text, image in self._example_iter():
            texts.append(text)
            images.append(image)
            if len(texts) == self.batch_size:
                yield self._collate(texts, images)
                texts, images = [], []
        if texts and not self.drop_remainder:
            yield self._collate(texts, images)

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        err: list = []

        multihost = jax.process_count() > 1

        def place(arr):
            if self.mesh is None:
                return jax.device_put(arr)
            sharding = data_sharding(self.mesh, arr.ndim)
            if multihost:
                # each host feeds its own shard of the global batch; the
                # global array is assembled without cross-host transfers
                # (batch_size is then the PER-HOST batch)
                return jax.make_array_from_process_local_data(sharding, arr)
            return jax.device_put(arr, sharding)

        def worker():
            try:
                for tokens, images in self._host_batches():
                    q.put({"text": place(tokens), "image": place(images)})
            except Exception as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                return
            yield item
