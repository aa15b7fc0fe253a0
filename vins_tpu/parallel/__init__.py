# device-mesh scale-out: batched sequence replay (dp) + landmark-sharded Schur BA (mp)
