import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
exec(open("RUNS/r4/pool_forensic.py").read().split("for call in range")[0])
kw["k_max"] = 1
for it in range(16):
    u0, state = MP.pool_march(grid, dens_ref, kext, alb, ufest, u0, state, **kw)
    st = np.asarray(MP._status(state))
    act = np.asarray(state["slot"]) >= 0
    prev = np.asarray(state["prev"])
    seen = np.asarray(state["seen"])
    cc = np.asarray(state["cc"]); lnc = np.asarray(state["lnc"]); lsc = np.asarray(state["lsc"])
    na = act.sum()
    print(f"it {it}: rptr={st[0]} qh={st[1]} act={na} steps={st[5]} "
          f"prev[act]=[{prev[act].min() if na else 0:.3f},{prev[act].max() if na else 0:.3f}] "
          f"seen[act]={seen[act].sum() if na else 0} "
          f"cc!=nc={((cc!=lnc)&act).sum()}")
    if na == 0 and st[0] == st[1]:
        break
