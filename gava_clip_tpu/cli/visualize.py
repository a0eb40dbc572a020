"""Embedding-space visualization — counterpart of reference visualize.py /
visualize_add.py: PCA / t-SNE (/ UMAP when installed) projections of
text/knowledge/NTE/memory embedding spaces colored by label, and pairwise
cosine-similarity heatmaps.
"""

import argparse
import os
import os.path as osp
import pickle


import numpy as np


def load_embeddings(path: str, label_key: str = "updrs"):
    """(.npy features, no labels) or memory-bank style .pkl."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32), None
    with open(path, "rb") as f:
        data = pickle.load(f)
    feats = np.asarray(data["embeds"], np.float32)
    if feats.ndim == 3:
        feats = feats.mean(-2)
    labels = np.asarray(data[label_key]).reshape(-1) if label_key in data else None
    return feats, labels


def project(feats: np.ndarray, method: str = "pca", seed: int = 0) -> np.ndarray:
    if method == "pca":
        from sklearn.decomposition import PCA
        return PCA(n_components=2, random_state=seed).fit_transform(feats)
    if method == "tsne":
        from sklearn.manifold import TSNE
        return TSNE(n_components=2, random_state=seed,
                    init="pca", perplexity=min(30, max(2, len(feats) // 4))
                    ).fit_transform(feats)
    if method == "umap":
        try:
            import umap
        except ImportError as e:
            raise SystemExit("umap-learn is not installed") from e
        return umap.UMAP(n_components=2, random_state=seed).fit_transform(feats)
    raise ValueError(method)


def cosine_similarity_matrix(feats: np.ndarray) -> np.ndarray:
    n = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    return n @ n.T


def _parse_named(specs):
    """['name=path', ...] -> [(name, path)], name defaulting to basename."""
    out = []
    for s in specs:
        if "=" in s:
            name, path = s.split("=", 1)
        else:
            name, path = osp.splitext(osp.basename(s))[0], s
        out.append((name, path))
    return out


def cone_projection(named_embeds, method: str = "pca", seed: int = 0):
    """Modality-cone scatter data (reference visualize.py:67-113): all
    modality groups are L2-normalized and jointly projected to 3 components;
    returns (points (N,3|2), labels list)."""
    feats, labels = [], []
    for name, emb in named_embeds:
        emb = np.asarray(emb, np.float32)
        feats.append(emb)
        labels.extend([name] * emb.shape[0])
    feats = np.concatenate(feats, axis=0)
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    if method == "pca":
        from sklearn.decomposition import PCA
        pts = PCA(n_components=3, random_state=seed).fit_transform(feats)
    elif method == "tsne":
        from sklearn.manifold import TSNE
        pts = TSNE(n_components=2, random_state=seed, init="pca",
                   perplexity=min(30, max(2, len(feats) // 4))
                   ).fit_transform(feats)
    else:
        raise ValueError(method)
    return pts, labels


def pairwise_similarity_split(base: np.ndarray, sub: np.ndarray):
    """Split pairwise cosine similarities of [base; sub] into base<->base
    and (base|sub)<->sub populations (reference visualize.py:116-153) —
    the per-modality histograms that expose the modality gap."""
    embed = np.concatenate([base, sub], axis=0)
    normed = embed / np.linalg.norm(embed, axis=-1, keepdims=True)
    sim = normed @ normed.T
    valid = np.triu(np.ones(sim.shape[0], dtype=bool), k=1)
    base_ids, sub_ids = valid.copy(), valid.copy()
    base_ids[:, -sub.shape[0]:] = False
    sub_ids[:, :-sub.shape[0]] = False
    return sim[base_ids].ravel(), sim[sub_ids].ravel()


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _save_matrix(mat, title, path, plt):
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(mat, interpolation="nearest", cmap="gray", origin="lower",
                   vmin=mat.min(), vmax=max(1.0, float(mat.max())))
    ax.set_title(title)
    fig.colorbar(im)
    plt.savefig(path, dpi=120)
    plt.close(fig)


def run_cones(args):
    named = [(n, load_embeddings(p, args.label_key)[0])
             for n, p in _parse_named(args.cones)]
    pts, labels = cone_projection(named, args.method, args.seed)
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    for name in dict.fromkeys(labels):      # insertion order
        m = np.asarray([l == name for l in labels])
        ax.scatter(pts[m, 0], pts[m, 1], s=8, alpha=0.6, label=name)
    ax.legend(title="modality cones")
    ax.set_title(f"modality cones ({args.method})")
    os.makedirs(args.output_dir, exist_ok=True)
    path = osp.join(args.output_dir, f"cones_{args.method}.png")
    plt.savefig(path, dpi=120)
    plt.close(fig)
    print({"cones": path})
    return {"cones": path, "points": pts, "labels": labels}


def run_pairwise(args):
    base, _ = load_embeddings(args.base, args.label_key)
    plt = _plt()
    os.makedirs(args.output_dir, exist_ok=True)
    out = {}
    for name, path in _parse_named(args.pairwise):
        sub, _ = load_embeddings(path, args.label_key)
        bb, bs = pairwise_similarity_split(base, sub)
        print(f"{name}: mean base<->base {bb.mean():.4f}, "
              f"mean <->sub {bs.mean():.4f}, min {min(bb.min(), bs.min()):.4f}")
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.hist(bb, bins=50, alpha=0.4, label=args.base_name, density=True)
        ax.hist(bs, bins=50, alpha=0.4, label=name, density=True)
        ax.legend()
        png = osp.join(args.output_dir, f"pairwise_{args.base_name}_{name}.png")
        plt.savefig(png, dpi=120)
        plt.close(fig)
        out[name] = {"png": png, "mean_base": float(bb.mean()),
                     "mean_sub": float(bs.mean())}
    return out


def run_study(args):
    """Number-word / PE geometry probes (reference
    prepare_embedding.py:35-238) against the frozen CLIP text tower."""
    from ..models.text import TextConfig
    from ..offline.embeddings import number_distance_study, pe_distance_study
    from ..utils.torch_convert import (convert_text_tower,
                                       load_torch_state_dict, strip_prefix)
    sd = strip_prefix(load_torch_state_dict(args.backbone_path), "textual.")
    tcfg = TextConfig(embed_dim=args.embed_dim, width=args.text_width,
                      heads=args.text_heads, layers=args.text_layers)
    params = convert_text_tower(sd, tcfg.layers)

    plt = _plt()
    os.makedirs(args.output_dir, exist_ok=True)
    out = {}
    if args.study == "number":
        res = number_distance_study(params, tcfg, n=args.study_n)
        for key, mats in res.items():
            for kind in ("similarity", "distance"):
                png = osp.join(args.output_dir, f"number_{key}_{kind}.png")
                _save_matrix(mats[kind], f"{key}: {kind}", png, plt)
                out[f"{key}_{kind}"] = png
    else:
        res = pe_distance_study(params, tcfg, n=args.study_n)
        for kind in ("similarity", "distance"):
            png = osp.join(args.output_dir, f"number_{kind}_pe.png")
            _save_matrix(res[kind], f"PE: {kind} between number words",
                         png, plt)
            out[kind] = png
    print(out)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", type=str, default="",
                        help=".npy features or memory-bank .pkl")
    parser.add_argument("--label_key", type=str, default="updrs")
    parser.add_argument("--method", choices=["pca", "tsne", "umap"],
                        default="pca")
    parser.add_argument("--heatmap", action="store_true",
                        help="also write a pairwise cosine-similarity heatmap")
    parser.add_argument("--max_points", type=int, default=2000)
    parser.add_argument("--output_dir", type=str, default="./vis_output")
    parser.add_argument("--seed", type=int, default=0)
    # modality-cone scatter over several embedding files (visualize.py:67-113)
    parser.add_argument("--cones", type=str, nargs="+", default=None,
                        metavar="NAME=PATH")
    # pairwise-similarity histograms vs a base modality (visualize.py:116-153)
    parser.add_argument("--pairwise", type=str, nargs="+", default=None,
                        metavar="NAME=PATH")
    parser.add_argument("--base", type=str, default="")
    parser.add_argument("--base_name", type=str, default="metadata")
    # number-word / PE geometry studies (prepare_embedding.py:35-238)
    parser.add_argument("--study", choices=["number", "pe"], default=None)
    parser.add_argument("--study_n", type=int, default=100)
    parser.add_argument("--backbone_path", type=str,
                        default="./pretrained/clip_pretrained.pth")
    parser.add_argument("--embed_dim", type=int, default=512)
    parser.add_argument("--text_width", type=int, default=512)
    parser.add_argument("--text_heads", type=int, default=8)
    parser.add_argument("--text_layers", type=int, default=12)
    # projected-NTE view (reference visualize_add.py:84-255): project the
    # memory-bank embeds through a trained checkpoint's per-class
    # memory_project MLPs before the 2D embedding
    parser.add_argument("--project_vlm", type=str, default="")
    args = parser.parse_args(argv)

    if args.cones:
        return run_cones(args)
    if args.pairwise:
        assert args.base, "--pairwise requires --base"
        return run_pairwise(args)
    if args.study:
        return run_study(args)

    assert args.embeddings, "--embeddings required outside cone/pairwise/study"
    feats, labels = load_embeddings(args.embeddings, args.label_key)

    if args.project_vlm:
        # reference visualize_projected_NTE: per-class memory_project replay
        from .decode import _load_vlm_heads
        assert labels is not None, "--project_vlm needs labeled embeddings"
        vlm_params, _ = _load_vlm_heads(args.project_vlm)
        mp = {k: np.asarray(v) for k, v in vlm_params["memory_project"].items()}
        n_cls = mp["w1"].shape[0]
        valid = (labels >= 0) & (labels < n_cls)
        feats, labels = feats[valid], labels[valid]
        h = np.tanh(np.einsum("me,ceh->cmh", feats, mp["w1"])
                    + mp["b1"][:, None])
        proj = np.einsum("cmh,chk->cmk", h, mp["w2"]) + mp["b2"][:, None]
        feats = proj[labels, np.arange(len(labels))]   # each row by its class
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    if len(feats) > args.max_points:
        idx = np.random.RandomState(args.seed).choice(
            len(feats), args.max_points, replace=False)
        feats = feats[idx]
        labels = labels[idx] if labels is not None else None

    pts = project(feats, args.method, args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    base = osp.splitext(osp.basename(args.embeddings))[0]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    if labels is not None:
        for lab in np.unique(labels):
            m = labels == lab
            ax.scatter(pts[m, 0], pts[m, 1], s=8, label=str(lab), alpha=0.7)
        ax.legend(title=args.label_key)
    else:
        ax.scatter(pts[:, 0], pts[:, 1], s=8, alpha=0.7)
    ax.set_title(f"{base} ({args.method})")
    scatter_path = osp.join(args.output_dir, f"{base}_{args.method}.png")
    plt.savefig(scatter_path, dpi=120)
    plt.close(fig)
    out = {"scatter": scatter_path}

    if args.heatmap:
        sim = cosine_similarity_matrix(feats[:256])
        fig, ax = plt.subplots(figsize=(8, 8))
        im = ax.imshow(sim, cmap="viridis")
        fig.colorbar(im)
        heat_path = osp.join(args.output_dir, f"{base}_similarity.png")
        plt.savefig(heat_path, dpi=120)
        plt.close(fig)
        out["heatmap"] = heat_path
    print(out)
    return out


if __name__ == "__main__":
    main()
