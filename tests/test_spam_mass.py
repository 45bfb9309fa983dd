"""spam_mass: exact-integer python replay + signal direction."""

from collections import defaultdict

from ontoweaver_spark.graphstats import spam_mass

EDGES = [
    # trusted cluster endorsing h
    ("t1", "t2"), ("t2", "t1"), ("t1", "h"), ("t2", "h"),
    # spam farm pumping p
    ("s1", "s2"), ("s2", "s3"), ("s3", "s1"),
    ("s1", "p"), ("s2", "p"), ("s3", "p"), ("p", "s1"),
]
SEEDS = ["t1", "t2"]


def _replay(edges, seeds, iterations=5, scale=1_000_000, damping=85):
    e = sorted(set(edges))
    od = defaultdict(int)
    nodes = set()
    for s, d in e:
        od[s] += 1
        nodes.update((s, d))
    teleport = (100 - damping) * scale // 100

    def run(init, tele_mask):
        rank = dict(init)
        for _ in range(iterations):
            inb = defaultdict(int)
            for s, d in e:
                inb[d] += rank[s] // od[s]
            rank = {
                n: tele_mask[n] * teleport + damping * inb[n] // 100
                for n in nodes
            }
        return rank

    ones = {n: 1 for n in nodes}
    pr = run({n: scale for n in nodes}, ones)
    seed_mask = {n: int(n in seeds) for n in nodes}
    tr = run({n: seed_mask[n] * scale for n in nodes}, seed_mask)
    nv, ns = len(nodes), len(set(seeds))
    out = {}
    for n in nodes:
        trs = tr[n] * nv // ns
        out[n] = (pr[n], trs, max(0, pr[n] - trs) * 1_000_000 // pr[n])
    return out


def test_replay_exact(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "node string")
    got = {
        r.node: (r.rank, r.trusted_rank, r.spam_mass_ppm)
        for r in spam_mass(edges, seeds).collect()
    }
    assert got == _replay(EDGES, SEEDS)


def test_spam_farm_scores_above_endorsed_node(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "node string")
    sm = {
        r.node: r.spam_mass_ppm for r in spam_mass(edges, seeds).collect()
    }
    assert sm["p"] > sm["h"]          # farm-pumped vs trusted-endorsed
    assert sm["t1"] == 0 and sm["t2"] == 0
    assert all(0 <= v <= 1_000_000 for v in sm.values())
