"""Native C++ sanitizer must be byte-identical to the Python reference."""
import random
import string

import pytest

from spt_proto_tpu.data.transform import (_native_sanitize, sanitize,
                                          sanitize_py)


def test_native_available():
    assert _native_sanitize() is not None, 'runtime lib failed to build'


CASES = [
    'hello   world',
    '  pad  ',
    'a () b [] c {} d',
    'word , next . end ! q ? s ; c :',
    'p1\n\n\n\np2',
    '',
    '\n\n',
    '(())',
    'a , , b',
    'tabs\t\tand\nnewlines mixed  ,  ok',
    'unicode café , fine',
    '((nested ()))',
    'trailing space before period .',
]


@pytest.mark.parametrize('case', CASES)
def test_native_matches_python(case):
    native = _native_sanitize()
    assert native(case) == sanitize_py(case)


def test_randomized_corpus():
    rng = random.Random(0)
    alphabet = string.ascii_letters + ' \t\n,.?!;:()[]{}'
    native = _native_sanitize()
    for _ in range(300):
        s = ''.join(rng.choice(alphabet) for _ in range(rng.randrange(200)))
        assert native(s) == sanitize_py(s), repr(s)


def test_sanitize_uses_native():
    assert sanitize('a  ,  b') == 'a, b'
