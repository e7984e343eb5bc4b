"""Restricted reader for legacy (pre-1.6) PyTorch checkpoint files.

The reference ships ten whole-model pickles
(``GCN_classifier/models/graphmodel_ep*.torch``, loaded at
``GCN_classifier/testgraph.py:90``) in the old non-zip serialization format.
``torch.load`` on a whole-model pickle would execute arbitrary reducers from
an untrusted file and import the reference's own code; this module instead
parses the container from scratch with a *restricted* unpickler:

* tensor-rebuild callables are mapped to local functions that produce
  **numpy** arrays (no torch involved);
* ``collections.OrderedDict`` is the only stdlib class constructed for real;
* every other global (``__main__.Net``, ``torch_geometric...GraphConv``,
  ``torch.nn...Linear``, inspector helpers, …) becomes an inert ``Stub``
  that records its state and never runs any code.

Layout of the legacy format (mirrors ``torch.serialization._legacy_save``):
four sequential pickles — magic number, protocol version, sys info, the
object graph (with storages emitted as persistent ids
``('storage', storage_type, root_key, location, numel, view_metadata)``) —
followed by a pickle of the ordered storage keys and, per key, an int64
element count and the raw little-endian buffer.
"""
from __future__ import annotations

import io
import pickle
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

MAGIC_NUMBER = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("<?"),
}


class StorageType:
    """Marker for ``torch.FloatStorage``-style globals (dtype only)."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)

    def __repr__(self):  # pragma: no cover
        return f"StorageType({self.name})"


class Storage:
    """Placeholder filled with a numpy buffer after the data section."""

    def __init__(self, key: str, dtype: np.dtype, numel: int):
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self.data: np.ndarray | None = None


class Stub:
    """Inert stand-in for any unknown pickled class.

    Captures constructor args and state without executing anything.  Module
    hierarchies remain navigable through ``__getattr__`` into the captured
    ``_modules`` / ``_parameters`` / ``_buffers`` dicts, mirroring how
    ``torch.nn.Module.__getattr__`` resolves attributes.
    """

    _stub_module = "?"
    _stub_name = "?"

    def __init__(self, *args, **kwargs):
        self._stub_args = args
        self._stub_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._stub_state = state

    def __getattr__(self, name: str):
        # mimic torch.nn.Module attribute lookup for convenience
        d = self.__dict__
        for container in ("_parameters", "_buffers", "_modules"):
            coll = d.get(container)
            if coll is not None and name in coll:
                return coll[name]
        raise AttributeError(
            f"{self._stub_module}.{self._stub_name} stub has no attribute {name!r}"
        )

    def __repr__(self):  # pragma: no cover
        return f"<stub {self._stub_module}.{self._stub_name}>"


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *extra):
    """Local replacement for ``torch._utils._rebuild_tensor_v2`` → numpy.

    ``stride`` is in elements; legacy files store contiguous row-major
    tensors plus the occasional transposed view, so ``as_strided`` over the
    flat buffer covers every case.  Resolution is deferred until the storage
    data section has been read.
    """
    return _LazyTensor(storage, storage_offset, tuple(size), tuple(stride))


def _rebuild_parameter(data, requires_grad=True, *extra):
    return data


class _LazyTensor:
    def __init__(self, storage: Storage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def resolve(self) -> np.ndarray:
        buf = self.storage.data
        if buf is None:
            raise ValueError(f"storage {self.storage.key} has no data")
        flat = buf[self.offset :]
        itemsize = flat.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            flat,
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, f, storages: Dict[str, Storage]):
        super().__init__(f, encoding="utf-8")
        self._storages = storages
        self._stub_cache: Dict[tuple, type] = {}

    def find_class(self, module: str, name: str):
        key = (module, name)
        if key in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[key]
        if module == "torch" and name in _STORAGE_DTYPES:
            return StorageType(name)
        if key not in self._stub_cache:
            self._stub_cache[key] = type(
                f"Stub_{name}", (Stub,), {"_stub_module": module, "_stub_name": name}
            )
        return self._stub_cache[key]

    def persistent_load(self, pid):
        if isinstance(pid, tuple) and pid and pid[0] == "module":
            # ('module', cls, source_file, source) — torch's source-tracking
            # record for nn.Module classes; the class is already a Stub.
            return pid[1]
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, storage_type, root_key, _location, numel = pid[:5]
        view_metadata = pid[5] if len(pid) > 5 else None
        dtype = (
            storage_type.dtype
            if isinstance(storage_type, StorageType)
            else np.dtype("<f4")
        )
        if root_key not in self._storages:
            self._storages[root_key] = Storage(root_key, dtype, numel)
        root = self._storages[root_key]
        if view_metadata is not None:
            view_key, offset, view_numel = view_metadata
            if view_key not in self._storages:
                view = Storage(view_key, dtype, view_numel)
                view._view_of = (root, offset)  # resolved after data read
                self._storages[view_key] = view
            return self._storages[view_key]
        return root


def _resolve(obj: Any, memo: dict | None = None) -> Any:
    """Replace every _LazyTensor in a parsed object graph with its array.

    ``memo`` guards against the reference cycles whole-module pickles carry
    (modules holding hooks/dicts that point back up the tree)."""
    if memo is None:
        memo = {}
    if isinstance(obj, _LazyTensor):
        key = id(obj)
        if key not in memo:
            memo[key] = obj.resolve()
        return memo[key]
    if id(obj) in memo:
        return memo[id(obj)]
    if isinstance(obj, (dict, OrderedDict)):
        memo[id(obj)] = obj
        for k in list(obj.keys()):
            obj[k] = _resolve(obj[k], memo)
        return obj
    if isinstance(obj, list):
        memo[id(obj)] = obj
        for i in range(len(obj)):
            obj[i] = _resolve(obj[i], memo)
        return obj
    if isinstance(obj, tuple):
        out = tuple(_resolve(v, memo) for v in obj)
        memo[id(obj)] = out
        return out
    if isinstance(obj, Stub):
        memo[id(obj)] = obj
        _resolve(obj.__dict__, memo)
        return obj
    return obj


def load_legacy_torch(path: str) -> Any:
    """Parse a legacy torch file into stubs + numpy arrays (see module doc)."""
    with open(path, "rb") as f:
        data = f.read()
    f = io.BytesIO(data)

    magic = pickle.load(f)
    if magic != MAGIC_NUMBER:
        raise ValueError(f"not a legacy torch file (magic {magic:#x})")
    _protocol = pickle.load(f)
    _sys_info = pickle.load(f)

    storages: Dict[str, Storage] = {}
    obj = _RestrictedUnpickler(f, storages).load()

    keys = pickle.load(f)
    for key in keys:
        st = storages[key]
        (numel,) = np.frombuffer(f.read(8), dtype="<i8")
        if numel != st.numel:
            raise ValueError(f"storage {key}: size mismatch {numel} != {st.numel}")
        nbytes = int(numel) * st.dtype.itemsize
        st.data = np.frombuffer(f.read(nbytes), dtype=st.dtype).copy()
    # resolve views (rare in these files, handled for completeness)
    for st in storages.values():
        if hasattr(st, "_view_of"):
            root, offset = st._view_of
            st.data = root.data[offset : offset + st.numel]

    return _resolve(obj)


def module_parameters(stub: Stub, prefix: str = "") -> "OrderedDict[str, np.ndarray]":
    """Flatten a pickled ``nn.Module`` stub tree into ``{path: array}``
    (the ``state_dict()`` view of a whole-model pickle)."""
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    params = stub.__dict__.get("_parameters") or {}
    for name, val in params.items():
        if isinstance(val, np.ndarray):
            out[prefix + name] = val
    bufs = stub.__dict__.get("_buffers") or {}
    for name, val in bufs.items():
        if isinstance(val, np.ndarray):
            out[prefix + name] = val
    mods = stub.__dict__.get("_modules") or {}
    for name, child in mods.items():
        if isinstance(child, Stub):
            out.update(module_parameters(child, prefix + name + "."))
    return out
