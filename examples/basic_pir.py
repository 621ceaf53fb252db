"""End-to-end PIR demo: build a database, privately retrieve an item.

Run: python examples/basic_pir.py [--db-size 1000] [--index 421]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db-size", type=int, default=1000)
    ap.add_argument("--item-size", type=int, default=288)
    ap.add_argument("--index", type=int, default=421)
    ap.add_argument("--dimensions", type=int, default=2)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    args.index %= args.db_size

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pir_tpu import (
        PirClient,
        PirDatabase,
        PirServer,
        create_pir_parameters,
        generate_encryption_params,
    )

    params = create_pir_parameters(
        args.db_size,
        args.item_size,
        args.dimensions,
        generate_encryption_params(4096, 24),
    )
    print(
        f"params: N=4096, items={args.db_size}x{args.item_size}B, "
        f"plaintexts={params.num_pt}, hypercube={params.dimensions}"
    )

    rng = np.random.default_rng(1234)
    database = [
        rng.integers(0, 256, args.item_size, dtype=np.uint8).tobytes()
        for _ in range(args.db_size)
    ]

    t0 = time.perf_counter()
    db = PirDatabase.create(database, params)
    server = PirServer.create(db, params)
    print(f"server setup (encode + NTT + Shoup): {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    client = PirClient.create(params)
    print(f"client setup (keygen): {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    request = client.create_request([args.index])
    print(
        f"request: {len(request.SerializeToString()) / 1e6:.2f} MB "
        f"in {time.perf_counter() - t0:.2f}s"
    )

    t0 = time.perf_counter()
    response = server.process_request(request)
    print(
        f"server processing: {time.perf_counter() - t0:.2f}s "
        f"(reply {len(response.SerializeToString()) / 1e6:.2f} MB)"
    )

    t0 = time.perf_counter()
    [item] = client.process_response([args.index], response)
    print(f"client decode: {time.perf_counter() - t0:.2f}s")

    assert item == database[args.index]
    print(f"retrieved item {args.index} correctly "
          f"({item[:8].hex()}... == {database[args.index][:8].hex()}...)")

    # a second query reuses the compiled pipeline and cached device keys
    other = (args.index + 1) % args.db_size
    t0 = time.perf_counter()
    response = server.process_request(client.create_request([other]))
    [item2] = client.process_response([other], response)
    assert item2 == database[other]
    print(f"second query (warm pipeline): {time.perf_counter() - t0:.2f}s")
    print("the server never learned which indices were retrieved.")


if __name__ == "__main__":
    main()
