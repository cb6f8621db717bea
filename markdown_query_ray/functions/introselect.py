"""Bit-for-bit port of libstdc++'s ``std::nth_element`` (introselect).

Xapian's wildcard/partial expansion cap and ELITE_SET selection keep the
subset that ``nth_element`` happens to leave in the first ``k`` slots
(api/queryinternal.cc OrContext::select_most_frequent /
select_elite_set). The standard leaves tie placement unspecified, so the
*observable result set* depends on the exact introselect implementation:
median-of-3 quickselect with a depth limit of 2*floor(log2(n)), falling
back to heap-select, finishing ranges of <= 3 with insertion sort (GCC
libstdc++ bits/stl_algo.h / stl_heap.h — the implementation xapian is
built against here). Porting it verbatim is the only way to match which
equal-keyed elements survive the cut.

``comp(a, b)`` is the strict-weak "less" the C++ caller passes (for
xapian's selections: greater-by-termfreq / greater-by-maxweight).
"""

from __future__ import annotations


def nth_element(a: list, nth: int, comp) -> None:
    """std::nth_element(a.begin(), a.begin()+nth, a.end(), comp) —
    rearranges ``a`` in place exactly as libstdc++ would."""
    n = len(a)
    if n == 0 or nth >= n:
        return
    _introselect(a, 0, nth, n, 2 * (n.bit_length() - 1), comp)


def _introselect(a, first, nth, last, depth, comp):
    while last - first > 3:
        if depth == 0:
            _heap_select(a, first, nth + 1, last, comp)
            a[first], a[nth] = a[nth], a[first]
            return
        depth -= 1
        cut = _unguarded_partition_pivot(a, first, last, comp)
        if cut <= nth:
            first = cut
        else:
            last = cut
    _insertion_sort(a, first, last, comp)


def _unguarded_partition_pivot(a, first, last, comp):
    mid = first + (last - first) // 2
    _move_median_to_first(a, first, first + 1, mid, last - 1, comp)
    return _unguarded_partition(a, first + 1, last, first, comp)


def _move_median_to_first(a, res, p, q, r, comp):
    if comp(a[p], a[q]):
        if comp(a[q], a[r]):
            a[res], a[q] = a[q], a[res]
        elif comp(a[p], a[r]):
            a[res], a[r] = a[r], a[res]
        else:
            a[res], a[p] = a[p], a[res]
    elif comp(a[p], a[r]):
        a[res], a[p] = a[p], a[res]
    elif comp(a[q], a[r]):
        a[res], a[r] = a[r], a[res]
    else:
        a[res], a[q] = a[q], a[res]


def _unguarded_partition(a, first, last, pivot, comp):
    while True:
        while comp(a[first], a[pivot]):
            first += 1
        last -= 1
        while comp(a[pivot], a[last]):
            last -= 1
        if not first < last:
            return first
        a[first], a[last] = a[last], a[first]
        first += 1


def _insertion_sort(a, first, last, comp):
    if first == last:
        return
    for i in range(first + 1, last):
        if comp(a[i], a[first]):
            val = a[i]
            a[first + 1:i + 1] = a[first:i]
            a[first] = val
        else:  # unguarded linear insert
            val = a[i]
            j = i - 1
            while comp(val, a[j]):
                a[j + 1] = a[j]
                j -= 1
            a[j + 1] = val


def _heap_select(a, first, middle, last, comp):
    _make_heap(a, first, middle, comp)
    for i in range(middle, last):
        if comp(a[i], a[first]):
            _pop_heap(a, first, middle, i, comp)


def _pop_heap(a, first, last, result, comp):
    value = a[result]
    a[result] = a[first]
    _adjust_heap(a, first, 0, last - first, value, comp)


def _make_heap(a, first, last, comp):
    length = last - first
    if length < 2:
        return
    parent = (length - 2) // 2
    while True:
        value = a[first + parent]
        _adjust_heap(a, first, parent, length, value, comp)
        if parent == 0:
            return
        parent -= 1


def _adjust_heap(a, first, hole, length, value, comp):
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if comp(a[first + second], a[first + second - 1]):
            second -= 1
        a[first + hole] = a[first + second]
        hole = second
    if (length & 1) == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        a[first + hole] = a[first + second - 1]
        hole = second - 1
    _push_heap(a, first, hole, top, value, comp)


def _push_heap(a, first, hole, top, value, comp):
    parent = (hole - 1) // 2
    while hole > top and comp(a[first + parent], value):
        a[first + hole] = a[first + parent]
        hole = parent
        parent = (hole - 1) // 2
    a[first + hole] = value
