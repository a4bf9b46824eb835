"""Email / domain / IP / phone / cookie kernels.

Analogues of /root/reference/osprey_worker/src/osprey/engine/stdlib/udfs/
email_domain.py:14-51, email_local_part.py:11-21, domain_tld.py:14-23,
domain_chopper.py:15-50, ip_network.py:13-28, phone_country.py:13-30,
phone_prefix.py:11-26, extract_cookie.py:16-27 and
example_plugins/src/udfs/domain.py:10-19 (RootDomain).

The reference loads the ``tld`` library's public-suffix table once per
worker; we carry a compact public-suffix subset (module-level constant =
the broadcast small side, built once per process).
"""

from __future__ import annotations

import ipaddress

import pyarrow as pa

from osprey_ray.expr import ExprError
from osprey_ray.kernels import register_rowwise

# compact public-suffix subset (full PSL is the production path; enough for
# deterministic tests — same shape as the tld library's effective-TLD logic)
_MULTI_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.ar", "com.tr", "example.org",
}


def _registered_domain(host: str) -> str:
    host = host.lower().strip(".")
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in _MULTI_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return last2


def _email_parts(email: str) -> tuple[str, str]:
    if "@" not in email:
        raise ExprError("not an email")
    local, _, dom = email.rpartition("@")
    if not local or not dom:
        raise ExprError("not an email")
    return local, dom.lower()


def _email_domain(rctx, target):
    if target is None:
        raise ExprError("None")
    return _registered_domain(_email_parts(target)[1])


def _email_subdomain(rctx, target):
    if target is None:
        raise ExprError("None")
    return _email_parts(target)[1]


def _email_local(rctx, target):
    if target is None:
        raise ExprError("None")
    return _email_parts(target)[0]


def _domain_tld(rctx, target):
    if target is None:
        raise ExprError("None")
    host = target.lower().strip(".")
    labels = host.split(".")
    if len(labels) < 2:
        raise ExprError("no tld")
    last2 = ".".join(labels[-2:])
    return last2 if last2 in _MULTI_SUFFIXES else labels[-1]


def _root_domain(rctx, target):
    if target is None:
        raise ExprError("None")
    return _registered_domain(target)


def _domain_chopper(rctx, target):
    """url list → normalized registered-domain list (domain_chopper.py:15-50)."""
    if target is None:
        raise ExprError("None")
    import re

    out = []
    for u in target:
        if u is None:
            continue
        m = re.match(r"(?:https?://)?([^/:\s]+)", u)
        if m:
            out.append(_registered_domain(m.group(1)))
    return out


def _ip_network(rctx, target):
    """v4 → /24 zeroed; v6 → compressed normalization (ip_network.py:13-28)."""
    if target is None:
        raise ExprError("None")
    try:
        ip = ipaddress.ip_address(target.strip())
    except ValueError:
        raise ExprError("bad ip")
    if ip.version == 4:
        return str(ipaddress.ip_network(f"{ip}/24", strict=False).network_address)
    return ip.compressed


# country calling-code prefix table (public ITU assignments, subset)
_PHONE_PREFIXES = {
    "1": "US", "7": "RU", "20": "EG", "27": "ZA", "30": "GR", "31": "NL",
    "32": "BE", "33": "FR", "34": "ES", "36": "HU", "39": "IT", "40": "RO",
    "41": "CH", "43": "AT", "44": "GB", "45": "DK", "46": "SE", "47": "NO",
    "48": "PL", "49": "DE", "51": "PE", "52": "MX", "54": "AR", "55": "BR",
    "56": "CL", "57": "CO", "58": "VE", "60": "MY", "61": "AU", "62": "ID",
    "63": "PH", "64": "NZ", "65": "SG", "66": "TH", "81": "JP", "82": "KR",
    "84": "VN", "86": "CN", "90": "TR", "91": "IN", "92": "PK", "93": "AF",
    "94": "LK", "95": "MM", "98": "IR", "212": "MA", "213": "DZ", "216": "TN",
    "234": "NG", "254": "KE", "255": "TZ", "256": "UG", "351": "PT",
    "352": "LU", "353": "IE", "358": "FI", "380": "UA", "420": "CZ",
    "421": "SK", "852": "HK", "886": "TW", "971": "AE", "972": "IL",
    "966": "SA", "880": "BD", "977": "NP",
}


def _phone_digits(target: str) -> str:
    d = "".join(c for c in target if c.isdigit())
    if not d:
        raise ExprError("no digits")
    return d


def _phone_prefix(rctx, target):
    if target is None:
        raise ExprError("None")
    d = _phone_digits(target)
    for k in (3, 2, 1):
        if d[:k] in _PHONE_PREFIXES:
            return d[:k]
    raise ExprError("unknown prefix")


def _phone_country(rctx, target):
    return _PHONE_PREFIXES[_phone_prefix(rctx, target)]


def _extract_cookie(rctx, header, name):
    if header is None:
        raise ExprError("None")
    for part in header.split(";"):
        k, _, v = part.strip().partition("=")
        if k == name:
            return v
    raise ExprError("cookie not found")


register_rowwise("EmailDomain", _email_domain, pa.string())
register_rowwise("EmailSubdomain", _email_subdomain, pa.string())
register_rowwise("EmailLocalPart", _email_local, pa.string())
register_rowwise("DomainTld", _domain_tld, pa.string())
register_rowwise("RootDomain", _root_domain, pa.string())
register_rowwise("DomainChopper", _domain_chopper, pa.list_(pa.string()))
register_rowwise("IpNetwork", _ip_network, pa.string())
register_rowwise("PhonePrefix", _phone_prefix, pa.string())
register_rowwise("PhoneCountry", _phone_country, pa.string())
register_rowwise("ExtractCookie", _extract_cookie, pa.string())
