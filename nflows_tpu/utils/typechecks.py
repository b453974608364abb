"""Python-level type predicates (reference: nflows/utils/typechecks.py:4-24).

These run at *construction* time only — never inside jit — so plain Python
asserts are fine here.
"""


def is_bool(x) -> bool:
    return isinstance(x, bool)


def is_int(x) -> bool:
    return isinstance(x, int) and not isinstance(x, bool)


def is_positive_int(x) -> bool:
    return is_int(x) and x > 0


def is_nonnegative_int(x) -> bool:
    return is_int(x) and x >= 0


def is_power_of_two(n) -> bool:
    if is_positive_int(n):
        return not n & (n - 1)
    return False
