"""The pull-model ``FeatureStream`` contract (stream/stream.h:16-88).

Reference semantics reproduced here:

- ``next(frame_no)`` with the frame cache guard: asking for the frame just
  produced returns the cached vector without recomputation
  (``frame_no_`` guard, stream/stream.h:38-46); asking for the successor
  (or passing a negative sentinel) advances the stream.
- End of stream raises ``StopIteration`` — the Python face of
  ``jiterator_error`` (common/jexception.h:44-163), exactly what the SWIG
  iterators translate it to.
- ``reset()`` rewinds the node *and its sources* (stream/stream.h contract);
  ``is_end()`` latches after the first EOF.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "FeatureStream",
    "PyVectorComplexFeatureStream",
    "PyVectorComplexFeatureStreamPtr",
]


class FeatureStream:
    """Base pull-stream node.  Subclasses implement ``_produce()`` (return
    the next frame or raise ``StopIteration``) and ``_reset()``."""

    def __init__(self, size: int, name: str = ""):
        self._size = int(size)
        self._name = name or type(self).__name__
        self._frame_no = -1
        self._current = None
        self._ended = False

    # -- reference API --------------------------------------------------
    def size(self) -> int:
        return self._size

    def name(self) -> str:
        return self._name

    def frame_no(self) -> int:
        return self._frame_no

    def is_end(self) -> bool:
        return self._ended

    def current(self):
        if self._current is None:
            raise RuntimeError(f"{self._name}: no frame produced yet")
        return self._current

    def next(self, frame_no: int = -5):
        """Produce frame ``frame_no`` (or the successor when negative).

        Only sequential access is supported — same as the reference, whose
        frame cache holds exactly one frame (stream/stream.h:38-46)."""
        if frame_no >= 0:
            if frame_no == self._frame_no:
                return self._current
            if frame_no != self._frame_no + 1:
                raise ValueError(
                    f"{self._name}: non-sequential access {frame_no} "
                    f"(current {self._frame_no})"
                )
        if self._ended:
            raise StopIteration
        try:
            out = self._produce()
        except StopIteration:
            self._ended = True
            raise
        self._frame_no += 1
        self._current = out
        return out

    def reset(self):
        self._frame_no = -1
        self._current = None
        self._ended = False
        self._reset()

    def __iter__(self):
        while True:
            try:
                yield self.next(self._frame_no + 1)
            except StopIteration:
                return

    # -- subclass hooks --------------------------------------------------
    def _produce(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _reset(self):
        pass


class PyVectorComplexFeatureStream(FeatureStream):
    """Wrap an arbitrary Python iterable of complex vectors as a stream.

    The reference needs this to insert pure-Python beamformers into a C++
    graph (stream/pyStream.h:27-41); here everything is Python already, so
    it is a thin adapter — kept because reference drivers call it
    (test_online_beamforming.py:128).  Passing a ``FeatureStream`` returns
    it unchanged semantics-wise (iteration delegates to the node)."""

    def __init__(self, source, size: int | None = None, name: str = "PyVectorComplexFeatureStream"):
        self._source = source
        if size is None:
            size = source.size() if hasattr(source, "size") else 0
        super().__init__(size, name)
        self._it = None

    def _produce(self):
        if isinstance(self._source, FeatureStream):
            return np.asarray(self._source.next(self._frame_no + 1))
        if self._it is None:
            self._it = iter(self._source)
        out = np.asarray(next(self._it))
        if self._size == 0:
            self._size = out.shape[-1]
        return out

    def _reset(self):
        self._it = None
        if hasattr(self._source, "reset"):
            self._source.reset()


PyVectorComplexFeatureStreamPtr = PyVectorComplexFeatureStream
