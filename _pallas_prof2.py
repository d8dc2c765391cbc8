import gzip, json, glob, collections
tr = sorted(glob.glob("/tmp/ptrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(tr)).get("traceEvents", [])
by_src = collections.Counter()
for e in ev:
    a = e.get("args", {})
    if e.get("ph") == "X" and "hlo_category" in a:
        d = int(a.get("device_duration_ps", "0"))/1e9/20
        by_src[(a.get("source","?"), e.get("name","")[:40])] += d
for (s, nm), d in by_src.most_common(24):
    print(f"{d:8.3f}  {nm:42s} {s}")
