"""Embedding-space visualization — counterpart of reference visualize.py /
visualize_add.py: PCA / t-SNE (/ UMAP when installed) projections of
text/knowledge/NTE/memory embedding spaces colored by label, and pairwise
cosine-similarity heatmaps.
"""

import argparse
import os
import os.path as osp
import pickle
from typing import Optional

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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", type=str, required=True,
                        help=".npy features or memory-bank .pkl")
    parser.add_argument("--label_key", type=str, default="updrs")
    parser.add_argument("--method", choices=["pca", "tsne", "umap"],
                        default="pca")
    parser.add_argument("--heatmap", action="store_true",
                        help="also write a pairwise cosine-similarity heatmap")
    parser.add_argument("--max_points", type=int, default=2000)
    parser.add_argument("--output_dir", type=str, default="./vis_output")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    feats, labels = load_embeddings(args.embeddings, args.label_key)
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
