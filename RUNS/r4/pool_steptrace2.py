import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
exec(open("RUNS/r4/pool_forensic.py").read().split("for call in range")[0])
kw["k_max"] = 1
last_rptr = 192
for it in range(16):
    u0, state = MP.pool_march(grid, dens_ref, kext, alb, ufest, u0, state, **kw)
    st = np.asarray(MP._status(state))
    rptr = int(st[0])
    if rptr > last_rptr:
        rf = np.asarray(state["rec_f"]); ri = np.asarray(state["rec_i"])
        ch = slice(last_rptr, rptr)
        p0 = rf[MP.RF_PREV0, ch]
        th = rf[MP.RF_TH, ch]
        beam = rf[MP.RF_BEAM, ch]
        ns = ri[MP.RI_NSIDE, ch]
        print(f"it {it}: new {rptr-last_rptr} children: prev0 uniq={np.unique(np.round(p0,4))[:6]} "
              f"nside={np.unique(ns)} beam={np.unique(np.round(beam,5))} th=[{th.min():.3f},{th.max():.3f}]")
        last_rptr = rptr
    if int(st[3]) == 0 and st[0] == st[1]:
        break
