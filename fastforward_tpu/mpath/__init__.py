"""mpath — module-tree query language.

Parity: reference `src/fastforward/mpath/` (1,782 LoC: parser, fragments,
selector algebra, search engine). Queries address modules in an NNX module
tree by path:

    ``**``                     any number of segments (including zero)
    ``*``                      exactly one segment (any name)
    ``name``                   a literal attribute name / list index
    ``[cls:SomeClass]``        module is an instance of SomeClass
    ``[re:pattern]``           segment name matches the regex
    ``[quantizer:tag/path]``   module is a quantizer whose metadata carries
                               the tag (reference `quant_init.py:22-69`)
    ``~fragment``              negation of a fragment
    ``a/b/c``                  path joining

Selectors compose in Python with ``/`` (join), ``&``, ``|`` and ``~``
(reference `selector.py:54-366`). `search` walks the module tree and returns
an `MPathCollection` supporting set operations and batch updates.
"""

from fastforward_tpu.mpath.fragments import (
    ClassFragment,
    Fragment,
    NameFragment,
    QuantizerTagFragment,
    RegexFragment,
    WildcardFragment,
)
from fastforward_tpu.mpath.parser import mpath_query_extension, parse
from fastforward_tpu.mpath.search import MPathCollection, MPathItem, search
from fastforward_tpu.mpath.selector import BaseSelector, MultiSelector, Selector

__all__ = [
    "query",
    "search",
    "parse",
    "mpath_query_extension",
    "Fragment",
    "NameFragment",
    "WildcardFragment",
    "ClassFragment",
    "RegexFragment",
    "QuantizerTagFragment",
    "Selector",
    "MultiSelector",
    "BaseSelector",
    "MPathCollection",
    "MPathItem",
]


def query(query_str, context=None):
    """Parse a query string into a Selector.

    ``context`` maps names used in ``[cls:...]`` fragments to classes
    (reference captures caller locals, `mpath/__init__.py:55-95`; here the
    context is explicit, with well-known fastforward/nnx classes available
    by default).
    """
    if isinstance(query_str, BaseSelector):
        return query_str
    return parse(query_str, context=context)
