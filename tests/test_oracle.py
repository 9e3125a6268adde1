"""Known-answer tests for the host crypto oracle.

Every device kernel is later tested against this module, so it has to be
airtight: vectors come from public standards (BIP173/340/350, EIP-55),
well-known key=1 derivations, the reference's own test anchors
(brainwallet vector: reference address.rs:233-238; puzzle #1 address:
reference provider.rs:81-85), and an independent OpenSSL cross-check.
"""

import hashlib

import pytest

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.crypto.address import (
    AddressFormat,
    AddressGenerator,
    derive_all,
    parse_private_key,
)
from vgen_tpu.crypto.encode import (
    base58check_decode,
    base58check_encode,
    bech32_decode,
    eip55_checksum_address,
    segwit_addr_encode,
    wif_decode,
    wif_encode,
)
from vgen_tpu.crypto.hashes import (
    hash160,
    keccak256,
    ripemd160,
    ripemd160_pure,
    sha256,
    tagged_hash,
)

ONE = (1).to_bytes(32, "big")


# --- hashes ---------------------------------------------------------------

def test_ripemd160_pure_vectors():
    assert ripemd160_pure(b"").hex() == "9c1185a5c5e9fc54612808977ee8f548b2258d31"
    assert ripemd160_pure(b"abc").hex() == "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"
    assert (
        ripemd160_pure(b"message digest").hex()
        == "5d0689ef49d2fae572b881b123a85ffa21595f36"
    )


def test_ripemd160_pure_matches_openssl_if_available():
    try:
        ref = hashlib.new("ripemd160", b"vgen-tpu cross check").digest()
    except Exception:
        pytest.skip("OpenSSL ripemd160 unavailable")
    assert ripemd160_pure(b"vgen-tpu cross check") == ref
    # multi-block message exercises padding across block boundaries
    long = bytes(range(256)) * 3
    assert ripemd160_pure(long) == hashlib.new("ripemd160", long).digest()


def test_keccak256_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # != sha3_256 (padding differs)
    assert keccak256(b"") != hashlib.sha3_256(b"").digest()
    # multi-block (rate = 136 bytes)
    assert len(keccak256(b"x" * 500)) == 32


def test_tagged_hash_structure():
    t = sha256(b"TapTweak")
    assert tagged_hash("TapTweak", b"\x01") == sha256(t + t + b"\x01")


# --- curve ----------------------------------------------------------------

def test_generator_on_curve():
    assert ec.is_on_curve(ec.G)
    assert ec.is_on_curve(ec.point_double(ec.G))
    assert ec.is_on_curve(ec.scalar_mult(12345))


def test_scalar_mult_order():
    assert ec.scalar_mult(ec.N) is None
    assert ec.scalar_mult(1) == ec.G
    assert ec.scalar_mult(ec.N - 1) == ec.point_neg(ec.G)


def test_scalar_mult_matches_openssl():
    cryptography = pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.asymmetric import ec as ossl_ec

    for k in (1, 2, 3, 0xDEADBEEF, 2**200 + 12345):
        priv = ossl_ec.derive_private_key(k, ossl_ec.SECP256K1())
        nums = priv.public_key().public_numbers()
        pt = ec.scalar_mult(k)
        assert pt == (nums.x, nums.y)


def test_ig_table():
    table = ec.ig_table(17, start=1)
    for i, pt in enumerate(table, start=1):
        assert pt == ec.scalar_mult(i)
    table5 = ec.ig_table(3, start=5)
    assert table5[0] == ec.scalar_mult(5)
    assert table5[2] == ec.scalar_mult(7)


def test_batch_inverse():
    vals = [1, 2, 12345, ec.P - 1, 0xABCDEF]
    invs = ec.batch_inverse(vals)
    for v, iv in zip(vals, invs):
        assert v * iv % ec.P == 1


def test_lift_x_even_y():
    x, pt_even = ec.xonly(ec.G)
    assert ec.lift_x(x) == pt_even


# --- encodings ------------------------------------------------------------

def test_base58check_roundtrip():
    payload = b"\x00" + bytes(range(20))
    s = base58check_encode(payload)
    assert base58check_decode(s) == payload
    assert s[0] == "1"


def test_base58check_leading_zeros():
    payload = b"\x00\x00\x00" + bytes(range(1, 23))
    s = base58check_encode(payload)
    assert s.startswith("111")
    assert base58check_decode(s) == payload


def test_bech32_bip173_vector():
    # BIP173: witness program = hash160 of G's compressed pubkey
    addr = segwit_addr_encode("bc", 0, hash160(ec.serialize_compressed(ec.G)))
    assert addr == "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"
    hrp, data, const = bech32_decode(addr)
    assert hrp == "bc" and data[0] == 0 and const == 1


def test_bech32m_const_for_witver1():
    addr = segwit_addr_encode("bc", 1, bytes(32))
    assert addr.startswith("bc1p")
    _, data, const = bech32_decode(addr)
    assert const == 0x2BC830A3 and data[0] == 1


def test_wif_known_key1():
    assert wif_encode(ONE, True) == "KwDiBf89QgGbjEhKnhXJuH7LrciVrZi3qYjgd9M7rFU73sVHnoWn"
    assert wif_encode(ONE, False) == "5HpHagT65TZzG1PH3CSu63k8DbpvD8s5ip4nEB3kEsreAnchuDf"
    sec, comp, ver = wif_decode(wif_encode(ONE, True))
    assert sec == ONE and comp and ver == 0x80
    sec, comp, _ = wif_decode(wif_encode(ONE, False))
    assert sec == ONE and not comp


def test_eip55_known_vectors():
    # from EIP-55 spec examples
    assert (
        eip55_checksum_address(bytes.fromhex("5aaeb6053f3e94c9b9a09f33669435e7ef1beaed"))
        == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed"
    )
    assert (
        eip55_checksum_address(bytes.fromhex("fb6916095ca1df60bb79ce92ce3ea74c37c5d359"))
        == "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359"
    )


# --- address derivations --------------------------------------------------

def test_brainwallet_known_address():
    """The reference's own known-answer test (address.rs:233-238)."""
    secret = sha256(b"correct horse battery staple")
    gen = AddressGenerator(AddressFormat.P2PKH)
    res = gen.generate(secret)
    assert res is not None
    assert res.address == "1C7zdTfnkzmr13HfA2vNm5SJYRK6nEKyq8"


def test_key1_known_addresses():
    d = derive_all(ONE)
    # puzzle #1 address (reference provider.rs:81-85 anchors this)
    assert d["p2pkh"] == "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"
    assert d["p2wpkh"] == "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"
    assert d["ethereum"] == "0x7E5F4552091A69125d5DfCb7b8C2659029395Bdf"
    assert d["p2sh_p2wpkh"].startswith("3")
    assert d["p2tr"].startswith("bc1p")
    assert d["p2pkh_uncompressed"].startswith("1")
    assert d["p2pkh_uncompressed"] != d["p2pkh"]


def test_format_prefixes_random_key():
    secret = sha256(b"vgen-tpu prefix test")
    assert AddressGenerator(AddressFormat.P2PKH).generate(secret).address[0] == "1"
    assert AddressGenerator(AddressFormat.P2SH_P2WPKH).generate(secret).address[0] == "3"
    assert AddressGenerator(AddressFormat.P2WPKH).generate(secret).address.startswith("bc1q")
    assert AddressGenerator(AddressFormat.P2TR).generate(secret).address.startswith("bc1p")
    eth = AddressGenerator(AddressFormat.ETHEREUM).generate(secret)
    assert eth.address.startswith("0x") and len(eth.address) == 42
    assert eth.wif == eth.hex  # parity: address.rs:111


def test_invalid_keys_rejected():
    gen = AddressGenerator(AddressFormat.P2PKH)
    assert gen.generate(bytes(32)) is None
    assert gen.generate(ec.N.to_bytes(32, "big")) is None
    assert gen.generate((ec.N - 1).to_bytes(32, "big")) is not None


def test_p2tr_tweak_consistency():
    # Q = P + t*G must be on curve with the tweak recomputable
    x, _ = ec.xonly(ec.scalar_mult(987654321))
    from vgen_tpu.crypto.address import taproot_output_x

    qx = taproot_output_x(x)
    assert ec.lift_x(qx) is not None


def test_parse_private_key():
    assert parse_private_key("KwDiBf89QgGbjEhKnhXJuH7LrciVrZi3qYjgd9M7rFU73sVHnoWn") == ONE
    assert parse_private_key("0x" + "00" * 31 + "01") == ONE
    assert parse_private_key("00" * 31 + "01") == ONE
    with pytest.raises(ValueError):
        parse_private_key("zzz")


def test_charset_names():
    assert AddressFormat.P2PKH.charset_name == "Base58"
    assert AddressFormat.P2PKH_UNCOMPRESSED.charset_name == "Base58"
    assert AddressFormat.P2SH_P2WPKH.charset_name == "Base58"
    assert AddressFormat.P2WPKH.charset_name == "Bech32"
    assert AddressFormat.P2TR.charset_name == "Bech32"
    assert AddressFormat.ETHEREUM.charset_name == "Hex"


def test_display_names():
    assert str(AddressFormat.P2PKH) == "P2PKH"
    assert str(AddressFormat.P2SH_P2WPKH) == "P2SH-P2WPKH"
    assert str(AddressFormat.P2PKH_UNCOMPRESSED) == "P2PKH (Uncompressed)"
