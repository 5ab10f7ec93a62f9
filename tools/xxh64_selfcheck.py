#!/usr/bin/env python3
"""Independent differential check of the XXH64-replay oracles.

Builds a synthetic ASCII corpus (random token lengths 1..40, so multi-block
shingles exercise the 3-block path), runs the COMMITTED dedup_simhash and
dedup_source_signature oracle SQL (read from a Verify dump's
oracle_sql.json) against it in DuckDB, and compares with a pure-Python
reimplementation of Spark's XXH64 + the simhash / minhash-agg semantics.
No Spark involved — this cross-checks the SQL replay against an
independent third implementation of the same public algorithm.

Usage: python3 tools/xxh64_selfcheck.py /tmp/verify_out [seed]
"""
import duckdb, json, random, string, sys

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87; P2 = 0xC2B2AE3D27D4EB4F; P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63; P5 = 0x27D4EB2F165667C5
SEED1 = 0x9747b28c17ef4831; SEED2 = 0x8badf00d5ca1ab1e

def rotl(x, r): return ((x << r) | (x >> (64 - r))) & M

def xxh64(data: bytes, seed: int) -> int:
    n = len(data); off = 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M]
        limit = n - 32
        while off <= limit:
            for i in range(4):
                w = int.from_bytes(data[off + 8 * i:off + 8 * i + 8], 'little')
                v[i] = (rotl((v[i] + w * P2) & M, 31) * P1) & M
            off += 32
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)) & M
        for x in v:
            h ^= (rotl((x * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off + 8 <= n:
        w = int.from_bytes(data[off:off + 8], 'little')
        h ^= (rotl((w * P2) & M, 31) * P1) & M
        h = (rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], 'little') * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (data[off] * P5) & M
        h = (rotl(h, 11) * P1) & M
        off += 1
    h ^= h >> 33; h = (h * P2) & M; h ^= h >> 29; h = (h * P3) & M; h ^= h >> 32
    return h

def signed(x): return x - (1 << 64) if x >= (1 << 63) else x

def py_simhash(tokens):
    votes = [0] * 64
    for t in tokens:
        h = xxh64(t.encode(), SEED1)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0: sig |= 1 << b
    return sig

def py_simhash_pairs(docs):
    sigs = {i: py_simhash(t.split()) for i, t in docs.items()}
    from collections import defaultdict
    buckets = defaultdict(list)
    for i, h in sigs.items():
        for b in range(4): buckets[(b, (h >> (16 * b)) & 0xFFFF)].append(i)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                ham = bin(sigs[ids[x]] ^ sigs[ids[y]]).count('1')
                if ham <= 12: pairs.add((ids[x], ids[y], ham))
    return pairs

def py_source_sig(docs_by_source):
    sigs = {}
    for src, texts in docs_by_source.items():
        mins = [float('inf')] * 128
        for text in texts:
            tk = text.split()
            if len(tk) < 3: continue
            for i in range(len(tk) - 2):
                sh = ' '.join(tk[i:i + 3])
                h1 = xxh64(sh.encode(), SEED1)
                h2p = xxh64(sh.encode(), SEED2) | 1
                for j in range(128):
                    g = signed((h1 + j * h2p) & M)
                    if g < mins[j]: mins[j] = g
        if any(m != float('inf') for m in mins): sigs[src] = mins
    out = set()
    for a in sorted(sigs):
        for b in sorted(sigs):
            if a < b:
                frac = sum(1 for j in range(128) if sigs[a][j] == sigs[b][j]) / 128.0
                # HALF-UP like Spark/DuckDB round() (python round() is
                # half-even: 4/128 = 0.03125 must become 0.0313, not 0.0312);
                # k/128 is dyadic so the float arithmetic below is exact
                import math
                out.add((a, b, math.floor(frac * 10000 + 0.5) / 10000))
    return out

def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    oracles = json.load(open(f'{out_dir}/oracle_sql.json'))
    rng = random.Random(seed)
    # synthetic corpus: 60 docs, 4 sources, tokens 1..40 chars (3-gram
    # shingles up to ~124 bytes -> exercises 0..3 xxh64 blocks), plus
    # planted near-dup pairs for the simhash bands to find
    vocab = [''.join(rng.choice(string.ascii_lowercase)
                     for _ in range(rng.randint(1, 40))) for _ in range(80)]
    docs, docs_by_source, rows = {}, {}, []
    for i in range(60):
        src = f's{i % 4}'
        tk = [rng.choice(vocab) for _ in range(rng.randint(3, 30))]
        if i % 7 == 0 and i > 0:
            tk = rows[i - 1][2].split()[:]  # near-dup of previous doc
            tk[rng.randrange(len(tk))] = rng.choice(vocab)
        text = ' '.join(tk)
        docs[i] = text
        docs_by_source.setdefault(src, []).append(text)
        rows.append((i, src, text))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    rc = 0
    got = set(map(tuple, con.execute(oracles['dedup_simhash']).fetchall()))
    want = py_simhash_pairs(docs)
    if got == want:
        print(f"dedup_simhash oracle == python reference ({len(got)} pairs)")
    else:
        print(f"dedup_simhash MISMATCH: missing={list(want - got)[:5]} extra={list(got - want)[:5]}")
        rc = 1
    got = set(map(tuple, con.execute(oracles['dedup_source_signature']).fetchall()))
    want = py_source_sig(docs_by_source)
    if got == want:
        print(f"dedup_source_signature oracle == python reference ({len(got)} pairs)")
    else:
        print(f"dedup_source_signature MISMATCH: missing={list(want - got)[:5]} extra={list(got - want)[:5]}")
        rc = 1
    sys.exit(rc)

if __name__ == '__main__':
    main()
