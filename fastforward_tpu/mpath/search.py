"""mpath search engine.

Parity: reference `mpath/_search.py` (364 LoC) — walks the module tree,
matches selector fragment chains against module paths (regex-style matching
with ``**`` multi-wildcards), and returns an `MPathCollection` supporting set
operations and batch module replacement.
"""

from typing import Any, Callable, Iterator, Optional, Sequence

from flax import nnx

from fastforward_tpu.mpath.fragments import Fragment
from fastforward_tpu.mpath.selector import BaseSelector, IntersectionSelector


class MPathItem:
    """One search result: the module, its path, and enough context to
    replace it in the tree."""

    def __init__(self, root: Any, path: tuple[str, ...], module: Any):
        self.root = root
        self.path = path
        self.module = module

    @property
    def full_name(self) -> str:
        return "/".join(self.path)

    def update_module(self, new_module: Any) -> None:
        """Replace this module in the tree (attribute or index assignment)."""
        parent = self.root
        for seg in self.path[:-1]:
            parent = _step(parent, seg)
        last = self.path[-1]
        if isinstance(parent, (list, nnx.List)):
            parent[int(last)] = new_module
        elif isinstance(parent, (dict, nnx.Dict)):
            parent[last] = new_module
        else:
            setattr(parent, last, new_module)
        self.module = new_module

    def __repr__(self) -> str:
        return f"MPathItem({self.full_name}: {type(self.module).__name__})"


def _step(obj: Any, segment: str) -> Any:
    if isinstance(obj, (list, tuple, nnx.List)):
        return obj[int(segment)]
    if isinstance(obj, (dict, nnx.Dict)):
        return obj[segment]
    return getattr(obj, segment)


class MPathCollection(Sequence):
    """An ordered set of MPathItems. Parity: reference `MPathCollection`
    (`mpath/_search.py`) with set-ops and batch `update_modules`."""

    def __init__(self, items: Sequence[MPathItem] = ()):
        self._items = list(items)

    def __len__(self) -> int:
        return len(self._items)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return MPathCollection(self._items[i])
        return self._items[i]

    def __iter__(self) -> Iterator[MPathItem]:
        return iter(self._items)

    @property
    def paths(self) -> list[str]:
        return [item.full_name for item in self._items]

    @property
    def modules(self) -> list[Any]:
        return [item.module for item in self._items]

    def __or__(self, other: "MPathCollection") -> "MPathCollection":
        seen = {i.path for i in self._items}
        extra = [i for i in other if i.path not in seen]
        return MPathCollection(self._items + extra)

    def __and__(self, other: "MPathCollection") -> "MPathCollection":
        keep = {i.path for i in other}
        return MPathCollection([i for i in self._items if i.path in keep])

    def __sub__(self, other: "MPathCollection") -> "MPathCollection":
        drop = {i.path for i in other}
        return MPathCollection([i for i in self._items if i.path not in drop])

    def update_modules(self, factory: Callable[[MPathItem], Any]) -> None:
        """Replace every matched module with ``factory(item)``."""
        for item in self._items:
            item.update_module(factory(item))

    def __repr__(self) -> str:
        lines = ",\n  ".join(repr(i) for i in self._items)
        return f"MPathCollection([\n  {lines}\n])" if self._items else "MPathCollection([])"


def _module_index(root: Any) -> dict[tuple[str, ...], Any]:
    index: dict[tuple[str, ...], Any] = {(): root}
    for path, module in nnx.iter_modules(root):
        index[tuple(str(p) for p in path)] = module
    return index


def _chain_matches(
    chain: tuple[Fragment, ...],
    path: tuple[str, ...],
    index: dict[tuple[str, ...], Any],
) -> bool:
    n_frag, n_seg = len(chain), len(path)

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def match(fi: int, si: int) -> bool:
        if fi == n_frag:
            return si == n_seg
        frag = chain[fi]
        if frag.is_multi:
            # ``**``: skip the fragment, or consume one segment and retry.
            if match(fi + 1, si):
                return True
            return si < n_seg and match(fi, si + 1)
        if si >= n_seg:
            return False
        module = index.get(path[: si + 1])
        return frag.matches(path[si], module) and match(fi + 1, si + 1)

    return match(0, 0)


def _selector_matches(
    selector: BaseSelector,
    path: tuple[str, ...],
    index: dict[tuple[str, ...], Any],
) -> bool:
    if isinstance(selector, IntersectionSelector):
        return all(_selector_matches(s, path, index) for s in selector.selectors)
    return any(_chain_matches(chain, path, index) for chain in selector.fragment_chains())


def search(selector, root, context: Optional[dict[str, Any]] = None) -> MPathCollection:
    """Find all modules in ``root`` whose path matches ``selector``.

    ``selector`` may be a query string or a Selector.
    """
    from fastforward_tpu.mpath import query as parse_query

    selector = parse_query(selector, context=context)
    index = _module_index(root)
    items = [
        MPathItem(root, path, module)
        for path, module in index.items()
        if path and _selector_matches(selector, path, index)
    ]
    # Deterministic order: by path.
    items.sort(key=lambda i: i.path)
    return MPathCollection(items)
