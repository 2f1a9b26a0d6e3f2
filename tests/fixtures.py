"""Synthetic AO3-shaped HTML fixtures (no real scraped content)."""


def work_page(work_id: str, title: str, author: str, paragraphs: list[str],
              kudos: int = 42) -> str:
    body = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    return f"""<!DOCTYPE html>
<html><head><title>{title}</title></head>
<body>
<dl class="work meta group">
  <dd class="rating tags"><a class="tag">General Audiences</a></dd>
  <dd class="fandom tags"><a class="tag">Test Fandom</a></dd>
  <dd class="relationship tags"><a class="tag">A/B</a></dd>
  <dd class="character tags"><a class="tag">Alice</a><a class="tag">Bob</a></dd>
  <dd class="freeform tags"><a class="tag">Fluff</a></dd>
  <dd class="language">English</dd>
  <dd class="published">2020-01-01</dd>
  <dd class="words">{sum(len(p.split()) for p in paragraphs)}</dd>
  <dd class="chapters">1/1</dd>
  <dd class="kudos">{kudos}</dd>
  <dd class="hits">1000</dd>
</dl>
<div id="workskin">
  <div class="preface group">
    <h2 class="title heading">{title}</h2>
    <h3 class="byline heading"><a href="/users/{author}">{author}</a></h3>
    <div class="summary module"><p>Summary text to strip.</p></div>
  </div>
  <div id="chapters">
    <h3 class="landmark heading">Chapter Text</h3>
    <div class="userstuff">{body}</div>
  </div>
</div>
</body></html>"""


def listing_page(work_ids: list[str]) -> str:
    items = "\n".join(
        f'<li class="work blurb group" id="work_{w}">'
        f'<h4 class="heading"><a href="/works/{w}">Work {w}</a>'
        f'<a href="/users/u">u</a></h4></li>'
        for w in work_ids
    )
    return f"<html><body><ol class='work index group'>{items}</ol></body></html>"


def broken_page() -> str:
    return "<html><body><h1>Error 500</h1></body></html>"
