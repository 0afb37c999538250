"""Core signal abstraction: the Signal protocol, SizedVec, and the
`signal` class decorator — the analog of the reference's Signal trait
(/root/reference/fawkes-crypto/src/core/signal.rs:9-51), SizedVec
(core/sizedvec.rs:19) and `#[derive(Signal)]` proc macro
(fawkes-crypto_derive/src/lib.rs:9-213).

A composite signal is a class whose fields are themselves signals
(CNum/CBool/SizedVec/other composites). `@signal(value_cls)` generates
the full protocol — alloc / from_const / get_value / as_const / switch /
inputize / assert_const / assert_eq / is_eq / clone — by recursing over
the declared fields, exactly what the reference derives per struct field
(derive lib.rs:160-213).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence


class SizedVec:
    """Fixed-length signal vector (reference core/sizedvec.rs:19): the
    element protocol applied memberwise, with length checked at alloc."""

    __slots__ = ("items",)

    def __init__(self, items: Sequence):
        self.items = list(items)

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    @staticmethod
    def alloc(elem_cls, cs, values, length: Optional[int] = None) -> "SizedVec":
        if values is None:
            assert length is not None, "length required for symbolic alloc"
            return SizedVec([elem_cls.alloc(cs, None) for _ in range(length)])
        values = list(values)
        if length is not None:
            assert len(values) == length, "SizedVec length mismatch"
        return SizedVec([elem_cls.alloc(cs, v) for v in values])

    @staticmethod
    def from_const(elem_cls, cs, values) -> "SizedVec":
        return SizedVec([elem_cls.from_const(cs, v) for v in values])

    def get_value(self):
        out = []
        for it in self.items:
            v = it.get_value()
            if v is None:
                return None
            out.append(v)
        return out

    def as_const(self):
        out = []
        for it in self.items:
            v = it.as_const()
            if v is None:
                return None
            out.append(v)
        return out

    def switch(self, bit, if_else: "SizedVec") -> "SizedVec":
        return SizedVec([a.switch(bit, b)
                         for a, b in zip(self.items, if_else.items)])

    def inputize(self):
        for it in self.items:
            it.inputize()

    def assert_eq(self, other: "SizedVec"):
        for a, b in zip(self.items, other.items):
            a.assert_eq(b)

    def assert_const(self, values):
        for a, v in zip(self.items, values):
            a.assert_const(v)

    def clone(self) -> "SizedVec":
        return SizedVec([it.clone() for it in self.items])


def signal(value_cls: Optional[type] = None,
           fields: Optional[List[str]] = None) -> Callable[[type], type]:
    """Class decorator deriving the Signal protocol from per-field
    declarations (the reference's #[derive(Signal)] + #[Value = "..."]).

    Usage:
        @signal(EdwardsPoint)
        class CEdwardsPoint:
            __signal_fields__ = {"x": CNum, "y": CNum}

    Field specs: a signal class (CNum, CBool, a composite) or a tuple
    (SizedVec, elem_cls) for vectors. The native value type `value_cls`
    must expose the same field names (positional construction is used:
    value_cls(*fields))."""

    def wrap(cls: type) -> type:
        spec = getattr(cls, "__signal_fields__", None)
        assert spec, f"{cls.__name__} needs __signal_fields__"
        names = list(spec.keys())

        def _field_alloc(fcls, cs, val, length=None):
            if isinstance(fcls, tuple):
                vec, elem = fcls
                return vec.alloc(elem, cs, val, length=length)
            return fcls.alloc(cs, val)

        def _field_const(fcls, cs, val):
            if isinstance(fcls, tuple):
                vec, elem = fcls
                return vec.from_const(elem, cs, val)
            return fcls.from_const(cs, val)

        def alloc(cs, value=None, length: Optional[int] = None):
            parts = []
            for n in names:
                v = getattr(value, n) if value is not None else None
                parts.append(_field_alloc(spec[n], cs, v, length=length))
            return cls(*parts)

        def from_const(cs, value):
            return cls(*[
                _field_const(spec[n], cs, getattr(value, n)) for n in names
            ])

        def get_value(self):
            vals = []
            for n in names:
                v = getattr(self, n).get_value()
                if v is None:
                    return None
                vals.append(v)
            return value_cls(*vals) if value_cls else tuple(vals)

        def as_const(self):
            vals = []
            for n in names:
                v = getattr(self, n).as_const()
                if v is None:
                    return None
                vals.append(v)
            return value_cls(*vals) if value_cls else tuple(vals)

        def switch(self, bit, if_else):
            return cls(*[
                getattr(self, n).switch(bit, getattr(if_else, n))
                for n in names
            ])

        def inputize(self):
            for n in names:
                getattr(self, n).inputize()

        def assert_eq(self, other):
            for n in names:
                getattr(self, n).assert_eq(getattr(other, n))

        def assert_const(self, value):
            for n in names:
                getattr(self, n).assert_const(getattr(value, n))

        def clone(self):
            return cls(*[getattr(self, n).clone() for n in names])

        derived = {
            "alloc": staticmethod(alloc),
            "from_const": staticmethod(from_const),
            "get_value": get_value,
            "as_const": as_const,
            "switch": switch,
            "inputize": inputize,
            "assert_eq": assert_eq,
            "assert_const": assert_const,
            "clone": clone,
        }
        for name, fn in derived.items():
            if name not in cls.__dict__:  # hand-written impls win
                setattr(cls, name, fn)
        return cls

    return wrap
