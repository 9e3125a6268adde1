"""Pattern engine tests: DFA correctness vs Python `re`, reference-parity
difficulty & charset validation (ported cases: reference pattern.rs:296-636),
and device digit-alphabet projection."""

import random
import re

import pytest

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.crypto.encode import BASE58_ALPHABET, BECH32_CHARSET
from vgen_tpu.pattern import Pattern, RegexError


# --- compile errors -------------------------------------------------------

def test_pattern_valid():
    Pattern("^1Cat")
    Pattern("^bc1q.*dead$")
    Pattern("1[Oo]ri")


def test_pattern_empty_rejected():
    with pytest.raises(RegexError):
        Pattern("")


def test_pattern_invalid_regex():
    with pytest.raises(RegexError):
        Pattern("[invalid")
    with pytest.raises(RegexError):
        Pattern("(unclosed")
    with pytest.raises(RegexError):
        Pattern("a{3,1}")


# --- matching semantics ---------------------------------------------------

def test_matches_simple():
    pat = Pattern("^1Cat")
    assert pat.matches("1CatXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX")
    assert not pat.matches("1DogXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX")
    assert not pat.matches("1catXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX")


def test_matches_case_insensitive():
    pat = Pattern("^1cat", case_insensitive=True)
    for s in ("1CatXXX", "1catXXX", "1CATXXX", "1cAtXXX"):
        assert pat.matches(s)
    assert not pat.matches("2catXXX")


def test_matches_suffix():
    pat = Pattern("dead$")
    assert pat.matches("bc1qXXXXXXXXXXXXXXXXXXXXXXXXXXXdead")
    assert not pat.matches("bc1qdeadXXXXXXXXXXXXXXXXXXXXXXXXXX")


def test_matches_class():
    pat = Pattern("^1[Oo]ri")
    assert pat.matches("1OriXXX")
    assert pat.matches("1oriXXX")
    assert not pat.matches("1ORIXXX")


def test_matches_unanchored_middle():
    pat = Pattern("abc")
    assert pat.matches("xxabcxx")
    assert pat.matches("abc")
    assert not pat.matches("abX")


def test_matches_dot_star():
    pat = Pattern("^bc1q.*dead$")
    assert pat.matches("bc1qzzzzdead")
    assert pat.matches("bc1qdead")
    assert not pat.matches("bc1qdeadz")
    assert not pat.matches("xbc1qdead")


def test_matches_alternation():
    pat = Pattern("^1(Cat|Dog)")
    assert pat.matches("1CatX")
    assert pat.matches("1DogX")
    assert not pat.matches("1CowX")


def test_matches_counted():
    pat = Pattern("^1z{2,3}X")
    assert not pat.matches("1zX")
    assert pat.matches("1zzX")
    assert pat.matches("1zzzX")
    assert not pat.matches("1zzzzX")


def test_matches_plus_opt():
    assert Pattern("^1a+b").matches("1aaab")
    assert not Pattern("^1a+b").matches("1b")
    assert Pattern("^1a?b").matches("1b")
    assert Pattern("^1a?b").matches("1ab")


def test_match_all_dot():
    # range subcommand default pattern "." (lib.rs:519)
    pat = Pattern(".")
    assert pat.matches("anything")
    assert pat.matches("1")


def test_fuzz_against_python_re():
    """Randomized cross-validation of the DFA against Python's re module."""
    rng = random.Random(1234)
    alphabet = "abc1XZ"
    pieces = ["a", "b", "c", "1", "X", "[ab]", "[^a]", ".", "a*", "b+", "c?",
              "(ab|ba)", "a{2}", "a{1,2}", "[a-c]"]
    for trial in range(300):
        n = rng.randint(1, 4)
        body = "".join(rng.choice(pieces) for _ in range(n))
        pat_str = body
        if rng.random() < 0.4:
            pat_str = "^" + pat_str
        if rng.random() < 0.4:
            pat_str = pat_str + "$"
        try:
            gold = re.compile(pat_str)
        except re.error:
            continue
        pat = Pattern(pat_str)
        for _ in range(20):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
            expected = gold.search(s) is not None
            assert pat.matches(s) == expected, (pat_str, s)


def test_fuzz_case_insensitive_against_python_re():
    rng = random.Random(99)
    for _ in range(100):
        body = "".join(rng.choice(["a", "B", "[aB]", "c*"]) for _ in range(3))
        gold = re.compile("(?i)" + body)
        pat = Pattern(body, case_insensitive=True)
        for _ in range(10):
            s = "".join(rng.choice("aAbBcC") for _ in range(rng.randint(0, 6)))
            assert pat.matches(s) == (gold.search(s) is not None), (body, s)


# --- device DFA projection ------------------------------------------------

def _b58_symbols(addr: str):
    return [BASE58_ALPHABET.index(c) for c in addr]


def test_device_dfa_base58_matches_host():
    pat = Pattern("^1Cat")
    dev = pat.device_dfa(AddressFormat.P2PKH)
    for addr in ("1CatXYZ", "1DogXYZ", "zz1Cat", "1Cat"):
        syms = _b58_symbols(addr) + [dev.eos_symbol] + [dev.pad_symbol] * 4
        assert dev.run(syms) == pat.matches(addr), addr


def test_device_dfa_pad_neutral():
    pat = Pattern("Cat$")
    dev = pat.device_dfa(AddressFormat.P2PKH)
    syms = _b58_symbols("1XCat") + [dev.eos_symbol]
    assert dev.run(syms)
    assert dev.run(syms + [dev.pad_symbol] * 10)
    # without EOS consumed, "$" can't have matched
    assert not dev.run(_b58_symbols("1XCat"))


def test_device_dfa_bech32_prefix_prerun():
    pat = Pattern("^bc1qac")
    dev = pat.device_dfa(AddressFormat.P2WPKH)
    # device emits only the post-"bc1" digits
    syms = [BECH32_CHARSET.index(c) for c in "qacxyz"]
    assert dev.run(syms + [dev.eos_symbol])
    syms2 = [BECH32_CHARSET.index(c) for c in "qzzxyz"]
    assert not dev.run(syms2 + [dev.eos_symbol])


def test_device_dfa_eth_mixed_case():
    pat = Pattern("^0xAb")
    dev = pat.device_dfa(AddressFormat.ETHEREUM)
    # eth symbols: 0-9 -> 0..9, a-f -> 10..15, A-F -> 16..21
    sym_A, sym_b = 16 + 0, 10 + 1
    assert dev.run([sym_A, sym_b, dev.eos_symbol])
    sym_a = 10
    assert not dev.run([sym_a, sym_b, dev.eos_symbol])


# --- difficulty (reference pattern.rs:363-452 parity) ---------------------

def test_difficulty_simple():
    assert Pattern("^1Ab").estimate_difficulty(AddressFormat.P2PKH) == 58**2


def test_difficulty_case_insensitive():
    assert (
        Pattern("^1Ab", case_insensitive=True).estimate_difficulty(AddressFormat.P2PKH)
        == 34**2
    )


def test_difficulty_bech32():
    assert Pattern("^bc1qab").estimate_difficulty(AddressFormat.P2WPKH) == 32**2


def test_difficulty_match_all():
    assert Pattern("^1").estimate_difficulty(AddressFormat.P2PKH) == 1


def test_difficulty_ethereum():
    assert Pattern("^0xdead").estimate_difficulty(AddressFormat.ETHEREUM) == 16**4


def test_difficulty_suffix_no_prefix_subtraction():
    assert Pattern("dead$").estimate_difficulty(AddressFormat.P2PKH) == 58**4


def test_difficulty_no_anchor():
    assert Pattern("Cat").estimate_difficulty(AddressFormat.P2PKH) == 58**3


def test_difficulty_anchor_without_prefix():
    assert Pattern("^Cat").estimate_difficulty(AddressFormat.P2PKH) == 58**3


def test_difficulty_partial_bech32_prefix():
    assert Pattern("^bc1ab").estimate_difficulty(AddressFormat.P2WPKH) == 32**2


def test_count_fixed_chars_via_difficulty():
    # [Oo] not fixed: 2 fixed chars beyond "1" prefix -> "1[Oo]ri" unanchored = 3 fixed
    assert Pattern("1[Oo]ri").estimate_difficulty(AddressFormat.P2PKH) == 58**3


# --- charset validation (reference pattern.rs:455-635 parity) -------------

P2PKH = AddressFormat.P2PKH


def test_validate_charset_base58_invalid():
    assert Pattern("^1OR").validate_charset(P2PKH) == ["O"]


def test_validate_charset_base58_valid():
    assert Pattern("^1Cat").validate_charset(P2PKH) == []


def test_validate_charset_base58_zero():
    assert Pattern("^10ri").validate_charset(P2PKH) == ["0"]


def test_validate_charset_base58_multiple():
    invalid = Pattern("^1OIl0").validate_charset(P2PKH)
    assert sorted(invalid) == sorted(["O", "I", "l", "0"])


def test_validate_charset_bech32():
    invalid = Pattern("^bc1qAB").validate_charset(AddressFormat.P2WPKH)
    assert "A" in invalid and "B" in invalid


def test_validate_charset_ethereum():
    invalid = Pattern("^0xghi").validate_charset(AddressFormat.ETHEREUM)
    assert "g" in invalid and "h" in invalid and "i" in invalid


def test_validate_charset_inside_class():
    invalid = Pattern("^1[0OIl]").validate_charset(P2PKH)
    for c in "0OIl":
        assert c in invalid


def test_validate_charset_class_with_valid():
    assert Pattern("^1[Aa]").validate_charset(P2PKH) == []


def test_validate_charset_class_range_dash():
    assert Pattern("^1[a-z]").validate_charset(P2PKH) == []


def test_validate_charset_class_mixed():
    assert Pattern("^1[A0]").validate_charset(P2PKH) == []


def test_validate_charset_negated_class():
    assert Pattern("^1[^0]").validate_charset(P2PKH) == []


def test_validate_charset_range_endpoints():
    assert Pattern("^1[0-9a]").validate_charset(P2PKH) == []


def test_validate_charset_range_expansion():
    # [I-O] includes valid J..N
    assert Pattern("^1[I-O]").validate_charset(P2PKH) == []


def test_validate_charset_single_invalid_class():
    assert Pattern("^1[0]").validate_charset(P2PKH) == ["0"]


def test_validate_charset_leading_hyphen():
    assert Pattern("^1[-A]").validate_charset(P2PKH) == []


def test_validate_charset_trailing_hyphen():
    assert Pattern("^1[A-]").validate_charset(P2PKH) == []


def test_validate_charset_leading_hyphen_all_invalid():
    assert Pattern("^1[-0]").validate_charset(P2PKH) == ["0"]


def test_validate_charset_dot_in_class():
    assert Pattern("^1[.]").validate_charset(P2PKH) == ["."]


def test_validate_charset_underscore_in_class():
    assert Pattern("^1[_]").validate_charset(P2PKH) == ["_"]


def test_validate_charset_dot_with_valid_in_class():
    assert Pattern("^1[.A]").validate_charset(P2PKH) == []


def test_validate_charset_escaped_dot_in_class():
    assert Pattern("^1[\\.]").validate_charset(P2PKH) == ["."]


def test_validate_charset_escaped_caret():
    assert Pattern("^1[\\^^]").validate_charset(P2PKH) == ["^"]


def test_original_and_flags():
    pat = Pattern("^1Cat")
    assert pat.original == "^1Cat"
    assert not pat.is_case_insensitive
    assert Pattern("^1Cat", True).is_case_insensitive


def test_matches_hex_escape():
    # \xHH / \x{HH} escapes (regex-crate surface, VERDICT r1 item 9)
    pat = Pattern(r"^1\x43at")  # \x43 == 'C'
    assert pat.matches("1CatXXX")
    assert not pat.matches("1DatXXX")
    pat = Pattern(r"^1\x{43}at")
    assert pat.matches("1CatXXX")
    pat = Pattern(r"[\x41-\x43]")  # range endpoints as hex escapes
    assert pat.matches("zzB")
    assert not pat.matches("zzD")


def test_matches_named_group():
    pat = Pattern(r"^1(?P<body>Cat|Dog)")
    assert pat.matches("1CatXXX")
    assert pat.matches("1DogXXX")
    assert not pat.matches("1FoxXXX")
    pat = Pattern(r"^1(?<body>Cat)")  # regex-crate alternate spelling
    assert pat.matches("1CatXXX")


def test_matches_posix_class():
    pat = Pattern(r"^1[[:digit:]]")
    assert pat.matches("17abc")
    assert not pat.matches("1abc")
    pat = Pattern(r"^1[[:^digit:]]")
    assert pat.matches("1abc")
    assert not pat.matches("17abc")
    pat = Pattern(r"^0x[[:xdigit:]]{4}$")
    assert pat.matches("0xAb3F")
    assert not pat.matches("0xAbZF")
    with pytest.raises(RegexError):
        Pattern(r"^1[[:bogus:]]")


def test_unsupported_group_flag_message():
    with pytest.raises(RegexError, match="unsupported group flags"):
        Pattern(r"^1(?=Cat)")  # lookahead: unsupported, clear error


def test_fuzz_escapes_against_python_re():
    rng = random.Random(7)
    pats = [r"\x41+", r"^[\x30-\x39]{2}", r"(?P<a>AB|CD)\x2e",
            r"[[:upper:]][[:digit:]]"]
    alphabet = "ABCD019.z"
    for p in pats:
        pat = Pattern(p)
        ref = re.compile(p.replace("[[:upper:]]", "[A-Z]").replace(
            "[[:digit:]]", "[0-9]"))
        for _ in range(300):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 8)))
            assert pat.matches(s) == bool(ref.search(s)), (p, s)
