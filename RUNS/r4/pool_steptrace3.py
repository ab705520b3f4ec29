import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
exec(open("RUNS/r4/pool_forensic.py").read().split("for call in range")[0])
kw["k_max"] = 1
last = 192
for it in range(6):
    u0, state = MP.pool_march(grid, dens_ref, kext, alb, ufest, u0, state, **kw)
    st = np.asarray(MP._status(state))
    rptr = int(st[0])
    if rptr > last:
        rf = np.asarray(state["rec_f"]); ri = np.asarray(state["rec_i"]); rI = np.asarray(state["rec_I0"])
        ch = slice(last, min(rptr, last + 8))
        np.set_printoptions(precision=4, suppress=True, linewidth=200)
        print(f"it {it}: rec_f rows (TH PH SX SY SZ BEAM CSN PREV0 OWNB XOWN) cols {ch}:")
        print(rf[:, ch])
        print("rec_i rows (NC IPIX NSIDE ISEL FLAGS SRC):")
        print(ri[:, ch])
        print("rec_I0 max:", rI[ch].max(axis=1))
        break
