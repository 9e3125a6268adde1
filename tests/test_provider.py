"""Provider tests (parity: reference provider.rs:65-143 + data integrity).

Beyond the reference's lookup tests, every embedded b1000 address is
Base58Check-validated (a corrupted entry cannot pass the 4-byte
double-SHA256 checksum) and cross-checked against the solved-key
derivation where both are embedded.
"""

import json

import pytest

from vgen_tpu import provider
from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
from vgen_tpu.crypto.encode import base58check_decode


def test_resolve_puzzle_1():
    # reference provider.rs:76-88 anchors puzzle 1
    r = provider.resolve("boha:b1000:1")
    assert r.address == "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"
    assert r.format == AddressFormat.P2PKH
    assert r.key_range == (1, 1)


def test_resolve_slash_syntax():
    r = provider.resolve("boha:b1000/1")
    assert r.address == "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"


def test_resolve_puzzle_66():
    # reference provider.rs:110-117 anchors puzzle 66
    r = provider.resolve("boha:b1000:66")
    assert r.address == "13zb1hQbWVsc2S7ZTZnP2G4undNNpdh5so"
    assert r.key_range == (1 << 65, (1 << 66) - 1)


def test_resolve_unsolved_puzzle_71_offline():
    # VERDICT r1 gap: unsolved puzzles must resolve without a user JSON
    r = provider.resolve("boha:b1000:71")
    assert r.address == "1PWo3JeB9jrGwfHDNpdGK54CRas7fsVzXU"
    assert r.key_range == (1 << 70, (1 << 71) - 1)
    assert r.format == AddressFormat.P2PKH


def test_resolve_invalid():
    assert provider.resolve("^1Cat") is None  # plain regex passthrough
    with pytest.raises(provider.ProviderError):
        provider.resolve("boha:invalid:999999")
    with pytest.raises(provider.ProviderError):
        provider.resolve("boha:b1000:0")
    with pytest.raises(provider.ProviderError):
        provider.resolve("boha:b1000:161")


def test_build_patterns():
    r = provider.resolve("boha:b1000:66")
    assert provider.build_pattern(r, 6) == "^13zb1h"
    assert provider.build_exact_pattern(r) == (
        "^13zb1hQbWVsc2S7ZTZnP2G4undNNpdh5so$"
    )


def test_embedded_addresses_pass_base58check():
    """Data integrity: every embedded address must carry a valid
    Base58Check checksum and a P2PKH version byte."""
    for n, addr in provider._B1000_ADDRESSES.items():
        payload = base58check_decode(addr)
        assert len(payload) == 21 and payload[0] == 0, (n, addr)


def test_embedded_addresses_match_solved_keys():
    """Where both a solved key and an address are embedded, the derivation
    must agree -- two independent data sources cross-checking each other."""
    gen = AddressGenerator(AddressFormat.P2PKH)
    overlap = set(provider._B1000_SOLVED_KEYS) & set(
        provider._B1000_ADDRESSES
    )
    assert overlap  # the cross-check must actually cover something
    for n in overlap:
        derived = gen.generate(
            provider._B1000_SOLVED_KEYS[n].to_bytes(32, "big")
        ).address
        assert derived == provider._B1000_ADDRESSES[n], n


def test_every_puzzle_1_to_100_resolves():
    for n in range(1, 101):
        r = provider.resolve(f"boha:b1000:{n}")
        assert r.address.startswith("1")
        assert r.key_range == (1 << (n - 1), (1 << n) - 1)


def test_external_json_override_with_kind(tmp_path, monkeypatch):
    data = {"b1000": {"102": {
        "address": "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4",
        "kind": "p2wpkh",
    }}}
    p = tmp_path / "puzzles.json"
    p.write_text(json.dumps(data))
    monkeypatch.setenv("VGEN_TPU_PUZZLES", str(p))
    r = provider.resolve("boha:b1000:102")
    assert r.format == AddressFormat.P2WPKH
    assert r.address.startswith("bc1q")


def test_external_collection_resolves(tmp_path, monkeypatch):
    """Non-b1000 boha collections resolve through the external-JSON hook
    (offline scope cut documented in README; reference routes any boha
    collection, provider.rs:17-20)."""
    import json

    data = {
        "gsmg": {
            "1": {
                "address": "1GSMG1JC9wtdSwfwApgj2xcmJPAwx7prBe",
                "kind": "p2pkh",
                "range": ["1", "ffffffff"],
            }
        }
    }
    p = tmp_path / "puzzles.json"
    p.write_text(json.dumps(data))
    monkeypatch.setenv("VGEN_TPU_PUZZLES", str(p))
    from vgen_tpu import provider

    res = provider.resolve("boha:gsmg:1")
    assert res.address == "1GSMG1JC9wtdSwfwApgj2xcmJPAwx7prBe"
    assert res.key_range == (1, 0xFFFFFFFF)


def test_unknown_collection_error_mentions_hook(monkeypatch):
    monkeypatch.delenv("VGEN_TPU_PUZZLES", raising=False)
    from vgen_tpu import provider

    with pytest.raises(provider.ProviderError, match="VGEN_TPU_PUZZLES"):
        provider.resolve("boha:gsmg:1")


def test_unknown_collection_error_has_recipe():
    """The unknown-collection failure must be a copy-pasteable recipe: the
    exact JSON schema with the user's own collection/id spliced in."""
    import pytest

    from vgen_tpu.provider import ProviderError, resolve

    with pytest.raises(ProviderError) as ei:
        resolve("boha:gsmg:1")
    msg = str(ei.value)
    assert '{"gsmg": {"1": {"address"' in msg
    assert "$VGEN_TPU_PUZZLES" in msg
    assert "boha:gsmg:1" in msg


def test_missing_b1000_entry_error_has_recipe():
    import pytest

    from vgen_tpu.provider import ProviderError, resolve

    with pytest.raises(ProviderError) as ei:
        resolve("boha:b1000:101")  # unsolved, no embedded address
    msg = str(ei.value)
    assert '{"b1000": {"101": {"address"' in msg
