"""Keccak-256 (pre-NIST padding 0x01, the Ethereum variant) — host reference
implementation + batched TPU kernel.

Used for pubkey -> Ethereum address derivation (keccak256(pubkey_xy_64B)[12:]),
the role of circuits/eth.circom PubkeyToAddress + the keccak256-circom gadget
in the reference (SURVEY.md §2.1/2.2). The TPU path is bit-parallel over the
batch: each 64-bit lane is an (hi, lo) uint32 pair (TPUs have no 64-bit int),
and all theta/rho/pi/chi/iota steps are elementwise uint32 ops the VPU eats.

Host path validated against the canonical keccak256("") vector and, in tests,
against the reference's fixture address sets.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RATE_BYTES = 136  # 1088-bit rate for 256-bit output
ROUNDS = 24

# Standard round constants (computed by LFSR; spelled out for clarity)
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offsets r[x][y] (Keccak spec)
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK64 = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK64


def _keccak_f(lanes: List[List[int]]) -> List[List[int]]:
    a = lanes
    for rnd in range(ROUNDS):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROT[x][y])
        # chi
        a = [
            [b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _MASK64) for y in range(5)]
            for x in range(5)
        ]
        # iota
        a[0][0] ^= _RC[rnd]
    return a


def keccak256(data: bytes) -> bytes:
    """Host Keccak-256 (Ethereum padding 0x01 / 0x80)."""
    padded = bytearray(data)
    pad_len = RATE_BYTES - (len(padded) % RATE_BYTES)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80

    lanes = [[0] * 5 for _ in range(5)]
    for block_start in range(0, len(padded), RATE_BYTES):
        block = padded[block_start : block_start + RATE_BYTES]
        for i in range(RATE_BYTES // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            x, y = i % 5, i // 5
            lanes[x][y] ^= lane
        lanes = _keccak_f(lanes)

    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += lanes[x][y].to_bytes(8, "little")
    return bytes(out)


def eth_address(pubkey: Tuple[int, int]) -> int:
    """keccak256(x || y as 32B big-endian each)[12:] as an int
    (circuits/eth.circom PubkeyToAddress semantics)."""
    data = pubkey[0].to_bytes(32, "big") + pubkey[1].to_bytes(32, "big")
    return int.from_bytes(keccak256(data)[12:], "big")


# ---------------------------------------------------------------------------
# Batched TPU kernel: fixed-length single-block messages
# ---------------------------------------------------------------------------


# Lane-parallel tables for the fori_loop kernel. Lanes are a flat axis of
# 25, index i = x + 5*y (absorption order). All steps are then whole-array
# ops over [B, 25]: theta = xor-reduce + roll, rho = per-lane variable
# rotation (vector shift amounts), pi = one gather, chi = two gathers.
# Keeping the permutation in a fori_loop (one round body compiled once)
# instead of 24 unrolled rounds of per-lane scalar slices is what makes the
# XLA:CPU/TPU compile take milliseconds rather than minutes.


def _keccak_tables():
    rot = np.zeros(25, dtype=np.uint32)
    pi_src = np.zeros(25, dtype=np.int32)
    for x in range(5):
        for y in range(5):
            rot[(2 * x + 3 * y) % 5 * 5 + y] = _ROT[x][y]
            # b[y][(2x+3y)%5] = a[x][y] : dest lane ((2x+3y)%5)*5_y? careful:
            # dest index i_d = y_d*5 + x_d with x_d = y, y_d = (2x+3y)%5
            pi_src[((2 * x + 3 * y) % 5) * 5 + y] = y * 5 + x
    # chi neighbor indices: lane (x, y) -> (x+1, y), (x+2, y); i = x + 5y
    idx = np.arange(25)
    xs, ys = idx % 5, idx // 5
    chi1 = ((xs + 1) % 5 + 5 * ys).astype(np.int32)
    chi2 = ((xs + 2) % 5 + 5 * ys).astype(np.int32)
    rc_hi = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)
    rc_lo = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
    return rot, pi_src, chi1, chi2, rc_hi, rc_lo


_ROT_FLAT, _PI_SRC, _CHI1, _CHI2, _RC_HI, _RC_LO = _keccak_tables()


def _rotl64_vec(hi: jnp.ndarray, lo: jnp.ndarray, n: jnp.ndarray):
    """Rotate-left 64-bit lanes (hi, lo uint32 [..., L]) by per-lane amounts
    n (uint32 [L], values in [0, 64))."""
    a = n % 32
    swap = (n // 32) % 2 == 1
    # avoid shift-by-32 UB: use a' = a or 1 and select for a == 0
    a_safe = jnp.maximum(a, 1)
    h1 = (hi << a) | jnp.where(a == 0, 0, lo >> (32 - a_safe))
    l1 = (lo << a) | jnp.where(a == 0, 0, hi >> (32 - a_safe))
    out_hi = jnp.where(swap, l1, h1)
    out_lo = jnp.where(swap, h1, l1)
    return out_hi, out_lo


@jax.jit
def _keccak_f_flat(hi: jnp.ndarray, lo: jnp.ndarray):
    """One Keccak-f[1600] permutation. hi/lo: uint32 [B, 25], lane i = x+5y."""
    rot = jnp.asarray(_ROT_FLAT)
    pi_src = jnp.asarray(_PI_SRC)
    chi1 = jnp.asarray(_CHI1)
    chi2 = jnp.asarray(_CHI2)
    rc_hi = jnp.asarray(_RC_HI)
    rc_lo = jnp.asarray(_RC_LO)
    one = jnp.uint32(1)

    def round_body(r, state):
        hi, lo = state
        # theta
        g_hi = hi.reshape(hi.shape[:-1] + (5, 5))  # [..., y, x]
        g_lo = lo.reshape(lo.shape[:-1] + (5, 5))
        c_hi = g_hi[..., 0, :] ^ g_hi[..., 1, :] ^ g_hi[..., 2, :] ^ g_hi[..., 3, :] ^ g_hi[..., 4, :]
        c_lo = g_lo[..., 0, :] ^ g_lo[..., 1, :] ^ g_lo[..., 2, :] ^ g_lo[..., 3, :] ^ g_lo[..., 4, :]
        # d[x] = c[x-1] ^ rotl1(c[x+1])
        r_hi = (c_hi << one) | (c_lo >> 31)
        r_lo = (c_lo << one) | (c_hi >> 31)
        d_hi = jnp.roll(c_hi, 1, axis=-1) ^ jnp.roll(r_hi, -1, axis=-1)
        d_lo = jnp.roll(c_lo, 1, axis=-1) ^ jnp.roll(r_lo, -1, axis=-1)
        hi = hi ^ jnp.tile(d_hi, 5)
        lo = lo ^ jnp.tile(d_lo, 5)
        # rho + pi: gather source lanes, then rotate by dest-lane amounts
        hi = hi[..., pi_src]
        lo = lo[..., pi_src]
        hi, lo = _rotl64_vec(hi, lo, rot)
        # chi
        hi = hi ^ (~hi[..., chi1] & hi[..., chi2])
        lo = lo ^ (~lo[..., chi1] & lo[..., chi2])
        # iota
        hi = hi.at[..., 0].set(hi[..., 0] ^ rc_hi[r])
        lo = lo.at[..., 0].set(lo[..., 0] ^ rc_lo[r])
        return hi, lo

    hi, lo = jax.lax.fori_loop(0, ROUNDS, round_body, (hi, lo))
    return hi, lo


def keccak_f_batch(state: jnp.ndarray) -> jnp.ndarray:
    """state: uint32 [B, 5, 5, 2] with [..., 0]=hi, [..., 1]=lo per lane
    (lane index [x][y]). One full Keccak-f[1600] permutation, batched."""
    b = state.shape[0]
    # [B, x, y, 2] -> flat lane axis i = x + 5y
    hi = jnp.transpose(state[..., 0], (0, 2, 1)).reshape(b, 25)
    lo = jnp.transpose(state[..., 1], (0, 2, 1)).reshape(b, 25)
    hi, lo = _keccak_f_flat(hi, lo)
    out = jnp.stack([hi.reshape(b, 5, 5), lo.reshape(b, 5, 5)], axis=-1)
    return jnp.transpose(out, (0, 2, 1, 3))


def keccak256_fixed_batch(msgs: np.ndarray) -> np.ndarray:
    """Batched Keccak-256 of equal-length messages (< RATE_BYTES, one block).
    msgs: uint8 [B, L] -> uint8 [B, 32]."""
    b, length = msgs.shape
    assert length < RATE_BYTES, "single-block only"
    padded = np.zeros((b, RATE_BYTES), dtype=np.uint8)
    padded[:, :length] = msgs
    padded[:, length] ^= 0x01
    padded[:, -1] ^= 0x80
    # bytes -> lanes (little-endian 64-bit), lane i at (x=i%5, y=i//5)
    lanes = padded.reshape(b, RATE_BYTES // 8, 8)
    lane_vals_lo = (
        lanes[:, :, 0].astype(np.uint32)
        | (lanes[:, :, 1].astype(np.uint32) << 8)
        | (lanes[:, :, 2].astype(np.uint32) << 16)
        | (lanes[:, :, 3].astype(np.uint32) << 24)
    )
    lane_vals_hi = (
        lanes[:, :, 4].astype(np.uint32)
        | (lanes[:, :, 5].astype(np.uint32) << 8)
        | (lanes[:, :, 6].astype(np.uint32) << 16)
        | (lanes[:, :, 7].astype(np.uint32) << 24)
    )
    state = np.zeros((b, 5, 5, 2), dtype=np.uint32)
    for i in range(RATE_BYTES // 8):
        x, y = i % 5, i // 5
        state[:, x, y, 0] = lane_vals_hi[:, i]
        state[:, x, y, 1] = lane_vals_lo[:, i]
    out_state = np.asarray(keccak_f_batch(jnp.asarray(state)))
    out = np.zeros((b, 32), dtype=np.uint8)
    for i in range(4):
        x, y = i % 5, i // 5
        lo = out_state[:, x, y, 1]
        hi = out_state[:, x, y, 0]
        for j in range(4):
            out[:, 8 * i + j] = (lo >> (8 * j)) & 0xFF
            out[:, 8 * i + 4 + j] = (hi >> (8 * j)) & 0xFF
    return out


def eth_addresses_batch(pubkeys: Sequence[Tuple[int, int]]) -> List[int]:
    """Batched pubkey -> address derivation on device."""
    msgs = np.zeros((len(pubkeys), 64), dtype=np.uint8)
    for i, (x, y) in enumerate(pubkeys):
        msgs[i, :32] = list(x.to_bytes(32, "big"))
        msgs[i, 32:] = list(y.to_bytes(32, "big"))
    digests = keccak256_fixed_batch(msgs)
    return [int.from_bytes(bytes(d[12:].tolist()), "big") for d in digests]
